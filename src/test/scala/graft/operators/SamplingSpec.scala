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

  test("cluster-safe split never straddles a near-dup family; singletons are THE q55 split") {
    import spark.implicits._
    // family {1,2,3} + family {10,11}; 20 and 21 are singletons; null
    // id dropped
    val items = (Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).map(Option(_)) :+
      Option.empty[Long]).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val comps = ConnectedComponents.components(pairs)

    val rows = Sampling.clusterSafeSplit(items, "doc_id", comps,
      evalPermille = 500).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cluster_id"), r.getAs[String]("split")))
    assert(rows.length == 7, "null ids are dropped")

    // a family shares one cluster id and therefore one split
    val byCluster = rows.groupBy(_._2)
    assert(byCluster(1L).map(_._1).toSet == Set(1L, 2L, 3L))
    assert(byCluster(10L).map(_._1).toSet == Set(10L, 11L))
    for ((_, members) <- byCluster)
      assert(members.map(_._3).toSet.size == 1,
        s"cluster straddles the split: $members")

    // singleton assignment IS withSplitBucket's q55 membership
    val buckets = Sampling.withSplitBucket(
        Seq(20L, 21L).toDF("doc_id"), "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("__bucket")).toMap
    for ((id, _, split) <- rows if id >= 20L)
      assert(split == (if (buckets(id) < 500) "eval" else "train"),
        s"singleton $id diverges from the q55 bucket")

    // a member's split is the CANONICAL id's bucket, not its own:
    // with enough planted families, some member must differ from its
    // own-id assignment (probability 2^-6 per family of being
    // all-same by luck is excluded by picking a family that differs)
    val own = Sampling.withSplitBucket(items.na.drop(), "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("__bucket") < 500L)).toMap
    val assigned = rows.map(t => t._1 -> (t._3 == "eval")).toMap
    val clustered = rows.filter(t => t._1 != t._2).map(_._1)
    assert(clustered.nonEmpty)
    // every clustered member follows its canonical id's own-bucket
    for (id <- clustered; canonical = rows.find(_._1 == id).get._2)
      assert(assigned(id) == own(canonical),
        s"member $id does not follow canonical $canonical")
  }
}
