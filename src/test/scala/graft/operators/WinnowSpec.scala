package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

class WinnowSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("winnowing guarantee: a shared run of >= w+k-1 tokens lands a shared fingerprint") {
    // docs 1 and 2 share a 10-token run (>= 4+3-1 = 6) inside unrelated
    // text; doc 3 is disjoint
    val run = (1 to 10).map(i => s"shared$i").mkString(" ")
    val d = Seq(
      (1L, (1 to 20).map(i => s"a$i").mkString(" ") + " " + run),
      (2L, run + " " + (1 to 20).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val fp = Winnow.fingerprints(d)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "the guarantee: some window inside the shared run selects the same gram hash")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty && (byDoc(2L) intersect byDoc(3L)).isEmpty)

    val m = Winnow.matches(d, minShared = 1L).collect()
    assert(m.length == 1 && m.head.getLong(0) == 1L && m.head.getLong(1) == 2L)
  }

  test("sketch density is ~2/(w+1) and positions are in-range selections of real grams") {
    val text = (1 to 300).map(i => s"t${i % 97}x$i").mkString(" ")
    val d = Seq((7L, text)).toDF("doc_id", "text")
    val fp = Winnow.fingerprints(d, window = 4).collect()
    val nGrams = 300 - 2
    val density = fp.length.toDouble / nGrams
    assert(density > 0.2 && density < 0.7,
      s"expected ~2/(w+1)=0.4 selection density, got $density")
    assert(fp.forall { r =>
      val pos = r.getLong(2); pos >= 1 && pos <= nGrams
    }, "fingerprint positions are 1-based gram indices")
  }

  test("hot fingerprints above the df cap carry no match signal; short docs fingerprint nothing") {
    // 30 docs all sharing the same text: every fingerprint's df = 30 >
    // cap of 20, so no pairs despite verbatim copies
    val text = (1 to 30).map(i => s"c$i").mkString(" ")
    val many = (1L to 30L).map(id => (id, text)).toDF("doc_id", "text")
    assert(Winnow.matches(many).count() == 0)
    assert(Winnow.matches(many, maxDf = 100L).count() == 30L * 29 / 2,
      "with the cap lifted every pair matches")

    // fewer grams than the window -> no full window, no fingerprints
    val short = Seq((1L, "a b c d e")).toDF("doc_id", "text") // 3 grams < window 4
    assert(Winnow.fingerprints(short, window = 4).count() == 0)
    assert(Winnow.fingerprints(Seq((1L, "a b")).toDF("doc_id", "text")).count() == 0)
  }

  test("driver corpus: planted near-dups surface as fingerprint matches") {
    val m = Winnow.matches(Tables.documents(spark, sf001))
    assert(m.count() > 0, "planted near-dups share long verbatim runs")
    // matches must be symmetric-free and thresholded
    assert(m.filter(col("a_id") >= col("b_id")).count() == 0)
    assert(m.agg(min("n_shared")).head.getLong(0) >= 2L)
  }
}
