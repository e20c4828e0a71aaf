package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible train/eval
  * split primitive for training-data pipelines. `df.sample()` is
  * seed-stable only for a fixed partitioning; repartition the input and
  * the sample changes. Hashing the ROW KEY instead makes membership a
  * pure function of the data: stable across runs, partitionings,
  * engines, and incremental loads (a row's split never flips when new
  * data arrives — the property that keeps eval sets honest).
  *
  * The hash is the first 12 hex digits of md5(salt ∥ key) reduced mod
  * 1000 — the same digit-extraction formulation as the MinHash base
  * ([[Dedup.minhashSignatures]]), so membership is exactly reproducible
  * in the DuckDB oracle (and any engine with md5). */
object Sampling {

  /** THE split-bucket definition: append a `__bucket` column in
    * [0, 1000) — the first 12 hex digits of md5(salt ∥ key) mod 1000 —
    * for rows with a non-null key (null-key rows are dropped: no
    * stable identity to hash). Every consumer of the md5-bucket split
    * ([[sampleByKey]], [[stratifiedSampleByKey]],
    * [[Decontaminate.contaminationReport]]) derives membership from
    * this one definition, so the "q66's test split IS the q55 sample"
    * invariant cannot drift. */
  def withSplitBucket(df: DataFrame, keyCol: String, salt: String = "graft"): DataFrame = {
    graft.GraftSession.ensureConfs(df.sparkSession)
    df.filter(col(keyCol).isNotNull)
      .withColumn("__h", md5(concat(lit(salt), col(keyCol).cast("string"))))
      .withColumn("__bucket", Dedup.md5Base48("__h") % 1000L)
      .drop("__h")
  }

  /** Keep rows whose key hashes into [0, permille) of 1000 buckets.
    * Deterministic, partition-independent, incremental-load-stable.
    * Different `salt`s draw independent samples (e.g. one salt for the
    * eval split, another for a debugging subsample).
    *
    * NULL keys are NEVER sampled (a null has no stable identity to
    * hash; engines also disagree on concat-with-null, so excluding them
    * is the only cross-engine-stable contract — oracles must mirror
    * with `key IS NOT NULL`). */
  def sampleByKey(df: DataFrame, keyCol: String, permille: Int,
      salt: String = "graft"): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille must be in [0,1000], got $permille")
    withSplitBucket(df, keyCol, salt)
      .filter(col("__bucket") < permille)
      .drop("__bucket")
  }

  /** Stratified deterministic sampling: per-stratum keep rates (class
    * balancing — e.g. downsample the dominant language, keep all of a
    * rare one). Same md5-bucket membership as [[sampleByKey]], with the
    * threshold chosen by the stratum column; strata not in `ratesPermille`
    * fall back to `defaultPermille`. All sampleByKey stability
    * properties carry over per stratum. */
  def stratifiedSampleByKey(df: DataFrame, keyCol: String, strataCol: String,
      ratesPermille: Map[String, Int], defaultPermille: Int = 0,
      salt: String = "graft"): DataFrame = {
    (ratesPermille.values ++ Seq(defaultPermille)).foreach(p =>
      require(p >= 0 && p <= 1000, s"permille must be in [0,1000], got $p"))
    val rate = ratesPermille.foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    withSplitBucket(df, keyCol, salt)
      .filter(col("__bucket") < rate)
      .drop("__bucket")
  }

  /** Leakage-safe train/eval split: md5-bucket membership keyed on the
    * near-dup CLUSTER id instead of the document's own id, so a
    * near-duplicate family never straddles the split. Bucketing doc
    * ids directly ([[sampleByKey]]) puts a test doc's near-twin in
    * train with probability ≈ train fraction — the contamination that
    * [[Decontaminate]] then has to detect after the fact; assigning by
    * the cluster's canonical id closes that leak at split time, and
    * the two compose (decontamination still catches sub-threshold
    * overlap the pair graph missed).
    *
    * `components` is the PRECOMPUTED `(node_id, cluster_id)` frame of
    * [[ConnectedComponents.components]] — the shared-frame rule: a
    * real pipeline runs the star iteration once and feeds labels,
    * keep-set, and this split from the same frame. Docs absent from
    * it are singleton clusters keyed by their own id, so with an empty
    * pair graph this IS [[withSplitBucket]]'s split. NULL ids are
    * dropped ([[withSplitBucket]]'s contract). Output:
    * `(idCol, cluster_id, split)` with `split ∈ train | eval`.
    *
    * Scale shape: the components frame is bounded by the pair-graph
    * node count (a vanishing fraction of the corpus under LSH
    * banding) and the corpus side is projected to the id column alone
    * before the label join, so the join ships ~8 bytes/doc either
    * way: it broadcasts when the frame's stats are known small
    * (checkpoint propagates them — the ScaleSpec-pinned path) and
    * otherwise falls back to a sort-merge on the bare id, q58's
    * audited labeling shape. Bucket and split are per-row
    * projections; the wide columns never move. */
  def clusterSafeSplit(items: DataFrame, idCol: String, components: DataFrame,
      evalPermille: Int, salt: String = "graft"): DataFrame = {
    require(evalPermille >= 0 && evalPermille <= 1000,
      s"evalPermille must be in [0,1000], got $evalPermille")
    val labeled = ConnectedComponents.clusterLabelsFromComponents(
      items, idCol, components)
    withSplitBucket(labeled, "cluster_id", salt)
      .withColumn("split",
        when(col("__bucket") < evalPermille, lit("eval")).otherwise(lit("train")))
      .drop("__bucket")
  }

  /** Deterministic per-group cap: keep at most `k` rows per group,
    * chosen by md5-hash order of the row key (key as tiebreak).
    * PRECONDITION: `keyCol` must be unique within each group — only
    * then is the ordering total and the kept set a pure function of
    * the data, like [[sampleByKey]]. With duplicate keys in a group
    * (e.g. after a join fan-out) the tied rows rank in arbitrary
    * physical order and the kept set can change with partitioning —
    * dedup or re-key first. The domain-balancing primitive of corpus
    * curation: "at most k documents per source/domain" without a
    * random sample that changes across runs or partitionings. Unlike
    * the bucket samplers this is NOT incremental-load-stable by
    * construction — a capped group is a top-k, and a new row hashing
    * below the current k-th necessarily displaces it; cap after splits
    * are frozen, not before.
    *
    * One hash shuffle on the group key; the rank is a BIGINT running
    * count (no Int row_number ceiling) and rows stop at k per group,
    * so skew cost is bounded by the sort of the hot group, not by
    * emitted rows. NULL keys are dropped ([[withSplitBucket]]'s
    * contract); NULL groups form their own group as SQL windows do. */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String, k: Int,
      salt: String = "graft"): DataFrame = {
    require(k >= 0, s"k must be non-negative, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(salt), col(keyCol).cast("string"))).asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(keyCol).isNotNull)
      .withColumn("__rk", count(lit(1)).over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}
