package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Tables

class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  test("sample membership is a pure function of the key: partitioning-independent") {
    val docs = Tables.documents(spark, sf001)
    val a = Sampling.sampleByKey(docs.repartition(7), "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByKey(docs.repartition(2), "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("incremental-load stability: a row's membership never flips when data grows") {
    val docs = Tables.documents(spark, sf001)
    val subset = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 100)
    val fromSubset = Sampling.sampleByKey(subset, "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fromFull = Sampling.sampleByKey(docs, "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).filter(_ < 100).toSet
    assert(fromSubset == fromFull)
  }

  test("stratified sampling applies per-stratum rates and nests with uniform samples") {
    val docs = Tables.documents(spark, sf001)
    val strat = Sampling.stratifiedSampleByKey(docs, "doc_id", "lang",
      Map("en" -> 100, "de" -> 1000), defaultPermille = 0)
    val byLang = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("de", 0L) == totals("de"), "permille 1000 keeps the whole stratum")
    assert(byLang.keySet.subsetOf(Set("en", "de")), "unlisted strata default to dropped")
    // same key+salt ⇒ a stratum's sample at rate r is a SUBSET of the
    // uniform sample at the same rate (membership is bucket < r)
    val enStrat = strat.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val uniform = Sampling.sampleByKey(docs, "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(enStrat.subsetOf(uniform))
  }

  test("sampled fraction tracks permille and salts draw independent samples") {
    val docs = Tables.documents(spark, sf001)
    val n = docs.count().toDouble
    val k100 = Sampling.sampleByKey(docs, "doc_id", 100).count().toDouble
    assert(math.abs(k100 / n - 0.1) < 0.06, s"10% sample drew ${k100 / n}")
    val s1 = Sampling.sampleByKey(docs, "doc_id", 500, salt = "a")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.sampleByKey(docs, "doc_id", 500, salt = "b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 != s2, "different salts must draw different samples")
    // permille bounds
    assert(Sampling.sampleByKey(docs, "doc_id", 0).count() == 0)
    assert(Sampling.sampleByKey(docs, "doc_id", 1000).count() == n.toLong)
  }
}
