package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** BM25 retrieval: the integer-exact scoring replayed by a THIRD,
  * plain-Scala implementation (beside the Spark plan and the DuckDB
  * oracle), plus the ranking properties BM25 exists to provide —
  * rarity weighting, tf saturation, length normalization, and the
  * contractual common-term pruning. */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Plain-Scala twin of Mixing.log2qExpr (floor(64·log2 x) by the
    * squaring algorithm — same defined truncations). */
  private def log2q(x0: Long): Long = {
    require(x0 >= 1)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(x0)
    var m = if (bits > 21) x0 >> (bits - 21) else x0 << (21 - bits)
    var f = 0L
    for (_ <- 1 to 6) {
      val q = (m * m) / 1048576L
      if (q >= 2097152L) { m = q / 2; f = f * 2 + 1 } else { m = q; f = f * 2 }
    }
    (bits - 1).toLong * 64 + f
  }

  // the split is data-derived (md5 buckets) — discover membership
  // first, then CONSTRUCT texts by role so the fixture is controlled
  private def splitIds(n: Int, evalPermille: Int): (Seq[Long], Seq[Long]) = {
    val ids = (1L to n.toLong)
    val buckets = Sampling.withSplitBucket(ids.toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.partition(buckets(_) < evalPermille)
  }

  test("scores equal an independent plain-Scala BM25 replay on a controlled fixture") {
    val (evalIds, trainIds) = splitIds(40, 500)
    assert(evalIds.nonEmpty && trainIds.size >= 6, s"fixture needs both splits: $evalIds")
    val q = evalIds.head
    val tq = trainIds.take(6)
    // train docs: varying tf of 'zebra' and lengths; filler distinct
    // per doc (so filler df = 1 each); one doc without the query term
    val docs = (
      Seq((q, "zebra quagga okapi")) ++
      evalIds.tail.map(i => (i, s"evfill$i")) ++
      Seq(
        (tq(0), "zebra aa0 bb0"),                                     // tf=1, dl=3
        (tq(1), "zebra zebra aa1"),                                   // tf=2, dl=3
        (tq(2), "zebra aa2 bb2 cc2 dd2 ee2 ff2 gg2 hh2 ii2 jj2 kk2"), // tf=1, dl=12
        (tq(3), "quagga aa3 bb3"),                                    // rarer term only
        (tq(4), "aa4 bb4 cc4"),                                       // no query terms
        (tq(5), "zebra quagga aa5")) ++                               // both terms
      trainIds.drop(6).map(i => (i, s"trfill$i"))
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, k = 10, evalPermille = 500, dfCap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap

    // independent replay
    val trainDocs = (
      Seq(
        (tq(0), Seq("zebra", "aa0", "bb0")),
        (tq(1), Seq("zebra", "zebra", "aa1")),
        (tq(2), "zebra aa2 bb2 cc2 dd2 ee2 ff2 gg2 hh2 ii2 jj2 kk2".split(" ").toSeq),
        (tq(3), Seq("quagga", "aa3", "bb3")),
        (tq(4), Seq("aa4", "bb4", "cc4")),
        (tq(5), Seq("zebra", "quagga", "aa5"))) ++
      trainIds.drop(6).map(i => (i, Seq(s"trfill$i")))
    )
    val n = trainDocs.size.toLong
    val tot = trainDocs.map(_._2.size.toLong).sum
    val avg = tot / n
    val df = trainDocs.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    def idf(t: String) = log2q(2 * n + 2) - log2q(2 * df(t) + 1)
    def score(qts: Set[String], ts: Seq[String]): Long = {
      val dl = ts.size.toLong
      val tf = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      qts.toSeq.filter(tf.contains).map { t =>
        idf(t) * ((22 * tf(t) * avg * 1024) / (10 * avg * tf(t) + 3 * avg + 9 * dl))
      }.sum
    }
    val qts = Set("zebra", "quagga", "okapi")
    val expected = trainDocs.map { case (id, ts) => id -> score(qts, ts) }
      .filter(_._2 > 0).toMap
    val got = out.collect { case ((e, tr), (s, _)) if e == q => tr -> s }
    assert(got == expected,
      s"Spark scores must equal the plain-Scala replay: got=$got expected=$expected")

    // ranking properties on the replayed pairs for eval doc q:
    val s = got
    assert(s(tq(1)) > s(tq(0)), "higher tf scores higher (monotone)")
    assert(s(tq(1)) < 2 * s(tq(0)), "tf saturation: doubling tf must not double the score")
    assert(s(tq(0)) > s(tq(2)), "same tf, longer doc scores lower (length normalization)")
    assert(s(tq(3)) > 0 && idf("quagga") > idf("zebra"),
      "the rarer term carries more idf")
    assert(s(tq(5)) > s(tq(0)), "matching two query terms beats one at equal dl")
    assert(!s.contains(tq(4)), "a doc sharing no query terms is never retrieved")
  }

  test("common-term pruning: a term over dfCap never scores; ranks are dense; partition-invariant") {
    val (evalIds, trainIds) = splitIds(60, 500)
    assert(evalIds.nonEmpty && trainIds.size >= 5)
    val q = evalIds.head
    // 'common' appears in EVERY train doc (df = |train| > cap=3);
    // 'rare' in exactly two
    val docs = (
      Seq((q, "common rare")) ++ evalIds.tail.map(i => (i, s"evfill$i")) ++
      trainIds.zipWithIndex.map { case (i, j) =>
        (i, if (j < 2) s"common rare fill$i" else s"common fill$i")
      }
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, k = 10, evalPermille = 500, dfCap = 3L)
    val rows = out.filter(col("eval_id") === q).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).sortBy(_._2)
    assert(rows.map(_._1).toSet == trainIds.take(2).toSet,
      "only the in-cap 'rare' postings score — 'common' is pruned")
    assert(rows.map(_._2).toSeq == (1L to rows.length), "dense ranks per eval doc")

    val again = Retrieval.bm25TopK(docs.repartition(7), k = 10,
      evalPermille = 500, dfCap = 3L)
      .collect().map(_.toString).sorted.toSeq
    assert(again == out.collect().map(_.toString).sorted.toSeq,
      "retrieval must be partition-invariant")
  }
}
