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
