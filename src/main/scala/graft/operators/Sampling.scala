package graft.operators

import org.apache.spark.sql.DataFrame
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
  def withSplitBucket(df: DataFrame, keyCol: String, salt: String = "graft"): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .withColumn("__h", md5(concat(lit(salt), col(keyCol).cast("string"))))
      .withColumn("__bucket", Dedup.md5Base48("__h") % 1000L)
      .drop("__h")

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
}
