package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** [[Ensemble.gateAgreement]] — the cross-family quality-gate
  * agreement matrix: every cell must recompute exactly from the three
  * family sheets evaluated independently, and the diagonal must
  * collapse to each signal's own kill census. */
class EnsembleSpec extends AnyFunSuite {
  import TestSpark._

  private val positive =
    col("source").isin("src0", "src1", "src2", "src3", "src4")

  test("cells recompute from the three family sheets; diagonals collapse") {
    val docs = Tables.documents(spark, sf001)
    val out = Ensemble.gateAgreement(docs, positive).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(out.size == 6, "3 signals -> 6 unordered pairs")

    // rebuild the per-doc kill flags from the families directly
    val nb = Classifier.nbQualityScores(docs, positive)
      .select("doc_id", "predicted").collect()
      .map(r => r.getLong(0) -> (r.getLong(1) == 0L)).toMap
    val lm = Phrases.lmQualityBuckets(docs, "text")
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> Set("tail", "empty").contains(r.getString(1)))
      .toMap
    val rl = QualityRules.audit(docs)
      .select("doc_id", "reason").collect()
      .map(r => r.getLong(0) -> (r.getString(1) != "kept")).toMap
    val ids = nb.keySet & lm.keySet & rl.keySet
    assert(ids.nonEmpty && ids.size == nb.size,
      "held-out docs must all carry lm + rules verdicts")
    val k = Map("rules" -> rl, "lm" -> lm, "nb" -> nb)
    val n = ids.size.toLong
    for {
      (a, b) <- out.keys
    } {
      val bk = ids.count(i => k(a)(i) && k(b)(i)).toLong
      val ao = ids.count(i => k(a)(i) && !k(b)(i)).toLong
      val bo = ids.count(i => !k(a)(i) && k(b)(i)).toLong
      val nn = ids.count(i => !k(a)(i) && !k(b)(i)).toLong
      val ag = bk + nn
      val agq = ((ag * 1024L) / n) * 1024L + (((ag * 1024L) % n) * 1024L) / n
      assert(out((a, b)) == ((bk, ao, bo, nn, agq)), s"cell ($a, $b)")
    }
    // diagonals: a signal always agrees with itself
    for (s <- Ensemble.SignalNames) {
      val (bk, ao, bo, nn, agq) = out((s, s))
      assert(ao == 0L && bo == 0L, s"one-sided cells on diagonal $s")
      assert(bk + nn == n, s"diagonal $s partitions the slice")
      assert(agq == 1048576L, s"diagonal $s agree rate")
    }
    // every cell partitions the same slice
    assert(out.values.forall { case (bk, ao, bo, nn, _) =>
      bk + ao + bo + nn == n })
    info(s"held-out slice $n docs; kill counts: " +
      Ensemble.SignalNames.map(s => s"$s=${ids.count(k(s))}").mkString(" "))
  }

  test("scorecard columns are bitwise the member sheets'; no source drops") {
    val docs = Tables.documents(spark, sf001)
    val sc = Ensemble.sourceScorecard(docs, positive).collect()
      .map(r => r.getString(0) -> r).toMap
    // the dedup census is the row universe at sf0.001 (every source
    // has docs); each member's columns must appear verbatim
    val dups = Dedup.dupRatesBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5)))).toMap
    val psi = Drift.lengthPsiBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val kl = Mixing.sourceKlDivergence(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(sc.keySet == dups.keySet && sc.keySet == psi.keySet,
      "full-outer joins must preserve every source")
    for ((s, r) <- sc) {
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == dups(s), s"dup cols of $s")
      assert(r.getLong(8) == kl(s), s"kl col of $s")
      assert((r.getLong(9), r.getLong(10)) == psi(s), s"psi cols of $s")
    }
  }

  test("per-source rates recompute; totals tie out to the agreement diagonals") {
    val docs = Tables.documents(spark, sf001)
    val bySrc = Ensemble.gateRatesBySource(docs, positive).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(bySrc.nonEmpty)
    // the per-source kill counts must sum to the q150 diagonals —
    // same kill frame, two rollups
    val diag = Ensemble.gateAgreement(docs, positive).collect()
      .filter(r => r.getString(0) == r.getString(1))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(bySrc.values.map(_._2).sum == diag("rules"), "rules total")
    assert(bySrc.values.map(_._3).sum == diag("lm"), "lm total")
    assert(bySrc.values.map(_._4).sum == diag("nb"), "nb total")
    // every rate recomputes from its own counts
    for ((src, (n, nr, nl, nn, rr, rl, rn)) <- bySrc) {
      def rq(c: Long) = ((c * 1024L) / n) * 1024L + (((c * 1024L) % n) * 1024L) / n
      assert(n > 0 && rr == rq(nr) && rl == rq(nl) && rn == rq(nn), s"rates of $src")
    }
  }
}
