package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DecontaminateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** ids whose md5 bucket puts them in the 10% test split (salt
    * "graft") — computed via the operator's own membership primitive so
    * the test doesn't hardcode bucket arithmetic. */
  private def testIds(ids: Seq[Long]): Set[Long] = {
    val df = ids.toDF("doc_id")
    Sampling.sampleByKey(df, "doc_id", permille = 100)
      .collect().map(_.getLong(0)).toSet
  }

  test("a train doc copying a test doc is reported; disjoint docs are not") {
    // find one test-split id and two train-split ids among small ids
    val split = testIds(1L to 200L)
    val testId = split.head
    val Seq(dirty, clean) = (1L to 200L).filterNot(split).take(2)
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq(
      (testId, shared),
      (dirty, shared + " juliett kilo lima"), // contains every test shingle
      (clean, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val rep = Decontaminate.contaminationReport(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep.contains(dirty), "copied train doc must be flagged")
    assert(rep(dirty)._1 >= 3L && rep(dirty)._2 == 1L)
    assert(!rep.contains(clean), "unrelated train doc must not be flagged")
    assert(!rep.contains(testId), "test docs are never reported as contaminated train docs")
  }

  test("shingles above the document-frequency cap carry no contamination signal") {
    val split = testIds(1L to 300L)
    val testId = split.head
    val trainIds = (1L to 300L).filterNot(split).take(30)
    // every doc (test + 30 train) shares the same text: each shingle's
    // df = 31 > cap of 20, so NOTHING may be reported despite verbatim copies
    val text = "november oscar papa quebec romeo sierra tango uniform victor"
    val docs = ((testId +: trainIds).map(id => (id, text))).toDF("doc_id", "text")
    assert(Decontaminate.contaminationReport(docs).isEmpty)
    // with the cap lifted the same corpus reports every train doc
    val lifted = Decontaminate.contaminationReport(docs, maxShingleDf = 100L)
    assert(lifted.count() == trainIds.size.toLong)
  }

  test("null doc ids are excluded from both splits") {
    val docs = Seq[(java.lang.Long, String)](
      (null, "whiskey xray yankee zulu one two"),
      (7L, "whiskey xray yankee zulu one two"))
      .toDF("doc_id", "text")
    // the null-id doc must not act as a test or train doc
    val rep = Decontaminate.contaminationReport(docs, testPermille = 1000)
    assert(rep.isEmpty)
  }

  test("bloom probe flags the copied doc and has no false negatives vs exact overlap") {
    val split = testIds(1L to 200L)
    val testId = split.head
    val Seq(dirty, clean) = (1L to 200L).filterNot(split).take(2)
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq(
      (testId, shared),
      (dirty, shared + " juliett kilo lima"),
      (clean, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val bloom = Decontaminate.bloomContaminationCandidates(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bloom.contains(dirty), "a verbatim copy always hits every probe bit")
    assert(bloom(dirty)._2 >= 3L, "every shared shingle is a candidate")
    assert(bloom(dirty)._2 <= bloom(dirty)._1, "candidates are bounded by the doc's shingles")
    assert(!bloom.contains(clean), "at 2^18 bits a 7-shingle filter cannot 4-bit-collide")

    // no false negatives on the driver corpus: every doc the exact
    // report flags (same minOverlap) must appear in the bloom candidates
    val d = graft.sources.Tables.documents(spark, sf001)
    val exact = Decontaminate.contaminationReport(d, maxShingleDf = Long.MaxValue)
      .select(col("train_id")).collect().map(_.getLong(0)).toSet
    val probed = Decontaminate.bloomContaminationCandidates(d, maxTestDf = Long.MaxValue)
      .select(col("train_id")).collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(probed),
      s"bloom must be a superset of exact; missing ${exact -- probed}")
  }

  test("eval-side report flags the compromised test doc; both directions agree on the evidence") {
    val split = testIds(1L to 200L)
    val testId = split.head
    val Seq(dirty, dirty2, clean) = (1L to 200L).filterNot(split).take(3)
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq(
      (testId, shared),
      (dirty, shared + " juliett kilo lima"),
      (dirty2, "mike november " + shared),
      (clean, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val rep = Decontaminate.evalContaminationReport(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep.keySet == Set(testId), "only the copied test doc is compromised")
    assert(rep(testId)._1 == 2L, "both leaking train docs are counted")
    assert(rep(testId)._2 >= 3L, "max overlap carries the worst pair's evidence")

    // the two directions read ONE evidence rule: every (train, test)
    // pair the train-side report implies must appear from the eval side
    val trainSide = Decontaminate.contaminationReport(docs)
      .collect().map(_.getLong(0)).toSet
    assert(trainSide == Set(dirty, dirty2))
  }

  test("semanticContaminationReport: planted paraphrase-leak geometry, exact evidence") {
    // discover split membership with the operator's own primitive (the
    // contaminationReport idiom above), then plant by role: two eval
    // items share a direction with one train vector (the leak), one
    // train vector is orthogonal to every eval item (clean), one
    // eval-train pair sits at cos 0.6 — BELOW the 0.9 line
    val split = testIds(1L to 300L)
    val Seq(ev1, ev2, ev3) = split.toSeq.sorted.take(3)
    val Seq(dirty, clean) = (1L to 300L).filterNot(split).take(2)
    val u = Array(1.0, 0.0, 0.0, 0.0)
    val dirtyV = Array(0.99, 0.01, 0.0, 0.0)
    val cleanV = Array(0.0, 1.0, 0.0, 0.0)
    val embs = Seq(
      ev1 -> u, ev3 -> u,                      // two identical eval probes
      ev2 -> Array(0.0, 0.6, 0.8, 0.0),        // cos(clean) = 0.6 < 0.9
      dirty -> dirtyV, clean -> cleanV
    ).toDF("vec_id", "embedding")
    val cents = Seq(0L -> u, 1L -> cleanV, 2L -> Array(0.0, 0.0, 1.0, 0.0))
      .toDF("vec_id", "embedding")
    // nprobe = nlist → exhaustive probing, no recall trade in the spec
    val rep = Decontaminate.semanticContaminationReport(
      embs, cents, threshold = 0.9, nprobe = 3, evalPermille = 100, dim = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rep.keySet == Set(dirty), s"only the leak is flagged: $rep")
    val (nEvals, maxCosQ, topEval) = rep(dirty)
    assert(nEvals == 2L, "both identical eval probes hit the leak")
    assert(topEval == math.min(ev1, ev3), "cos tie breaks to the min eval id")
    // the quantized evidence recomputes by hand: left-fold double dot,
    // one division chain, floor(.2^20)
    val dotUD = u.zip(dirtyV).map { case (a, b) => a * b }.sum
    val cos = dotUD / (math.sqrt(1.0) * math.sqrt(dirtyV.map(x => x * x).sum))
    assert(maxCosQ == math.floor(cos * 1048576.0).toLong)

    // degenerate permilles: no eval side / no train side -> empty sheet
    assert(Decontaminate.semanticContaminationReport(
      embs, cents, 0.9, 3, evalPermille = 0, dim = 4).isEmpty)
    assert(Decontaminate.semanticContaminationReport(
      embs, cents, 0.9, 3, evalPermille = 1000, dim = 4).isEmpty)
  }

  test("bloom probe positions are in range and the filter is test-split-bounded") {
    val d = Seq((1L, "alpha bravo charlie delta echo")).toDF("doc_id", "text")
    val m = 1L << 18
    val pos = Dedup.shingleRows(d)
      .select(explode(Decontaminate.bloomPositions(col("sh"), m)).as("p"))
      .collect().map(_.getLong(0))
    assert(pos.length == 12, "3 shingles x 4 probes")
    assert(pos.forall(p => p >= 0 && p < m))
  }
}
