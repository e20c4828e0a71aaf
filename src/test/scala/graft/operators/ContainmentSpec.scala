package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Dedup.containmentPairs]]: the containment values are re-derived
  * per returned pair from the two documents' exact 3-shingle sets in
  * plain Scala, and the containment ≥ Jaccard dominance invariant is
  * checked against q28 (cont = |∩|/min ≥ |∩|/|∪| = jacc, so every
  * Jaccard-verified pair must also appear in the containment output at
  * the lower threshold). */
class ContainmentSpec extends AnyFunSuite {
  import TestSpark._

  private def shingleSet(text: String): Set[String] =
    text.toLowerCase.split("\\s+", -1).toSeq.sliding(3)
      .filter(_.size == 3).map(_.mkString(" ")).toSet

  test("containment values match exact shingle-set arithmetic on sf0.01") {
    val docs = graft.sources.Tables.documents(spark, sf01)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Dedup.containmentPairs(
      graft.sources.Tables.documents(spark, sf01)).collect()
    assert(rows.nonEmpty, "expected containment pairs on the sf0.01 corpus")
    rows.foreach { r =>
      val a = shingleSet(docs(r.getAs[Long]("a_id")))
      val b = shingleSet(docs(r.getAs[Long]("b_id")))
      val nInt = (a intersect b).size.toLong
      assert(r.getAs[Long]("n_int") == nInt)
      assert(r.getAs[Long]("n_a") == a.size.toLong)
      assert(r.getAs[Long]("n_b") == b.size.toLong)
      val cont = nInt.toDouble / math.min(a.size, b.size)
      assert(r.getAs[Double]("cont") == cont)
      assert(cont >= 0.5)
    }
  }

  test("every q28 Jaccard pair also appears as a containment pair (dominance)") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val jacc = Dedup.nearDupPairs(docs)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = Dedup.containmentPairs(docs)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacc.subsetOf(cont),
      s"missing from containment output: ${jacc diff cont}")
  }
}
