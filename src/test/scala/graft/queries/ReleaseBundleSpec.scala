package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.ConnectedComponents

/** q108 release-bundle capstone invariants — the structural claims the
  * DuckDB hash can't express on its own:
  *  - the composed chain pays for the star iteration exactly ONCE
  *    (the shared-components-frame rule, VERDICT r6/r7);
  *  - statuses partition the corpus and `shard` is non-null exactly on
  *    sampled rows;
  *  - the sample respects the budget;
  *  - the split is genuinely cluster-safe: no near-dup cluster has
  *    kept members on both sides of the train/eval cut.
  */
class ReleaseBundleSpec extends AnyFunSuite {
  import TestSpark._

  test("release bundle: one star iteration, partitioning statuses, budget, cluster safety") {
    val before = ConnectedComponents.componentsRuns.get()
    val rel = graft.SparkEntry.queries("q108_release_bundle")(spark, sf001)
      .localCheckpoint(true)
    assert(ConnectedComponents.componentsRuns.get() - before == 1,
      "the release bundle must run the star iteration exactly once")

    val total = rel.count()
    val byStatus = rel.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet.subsetOf(
      Set("dropped_dup", "eval", "sampled", "train_unsampled")))
    assert(byStatus.values.sum == total, "statuses must partition the corpus")
    assert(byStatus.getOrElse("sampled", 0L) <= 250L, "sample exceeds the budget")
    assert(byStatus.getOrElse("sampled", 0L) > 0L)
    assert(byStatus.getOrElse("dropped_dup", 0L) > 0L,
      "testdata plants near-dups; none dropped means the dedup stage is dead")

    // shard non-null iff sampled
    assert(rel.filter(col("shard").isNotNull =!= (col("status") === "sampled"))
      .count() == 0)

    // cluster safety over the kept docs: a cluster never straddles the cut
    val straddling = rel.filter(col("status") =!= "dropped_dup")
      .withColumn("side", when(col("status") === "eval", "eval").otherwise("train"))
      .groupBy("cluster_id").agg(countDistinct(col("side")).as("sides"))
      .filter(col("sides") > 1).count()
    assert(straddling == 0, "a near-dup cluster straddles the train/eval split")

    // shards are contiguous from 0: the prefix-sum assignment leaves no gaps
    val shards = rel.filter(col("shard").isNotNull)
      .select(col("shard")).distinct().collect().map(_.getLong(0)).sorted
    assert(shards.headOption.contains(0L) &&
      shards.sameElements(shards.indices.map(_.toLong)),
      s"shard ids must be gapless from 0, got ${shards.mkString(",")}")
  }
}
