package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation kernels for 100 TB shuffles.
  *
  * AQE's skew-join splitting handles join-side skew at runtime; these
  * cover the aggregation-side case AQE does not: a groupBy where one key
  * carries a disproportionate share of rows, so a single reducer
  * partition becomes the straggler.
  *
  * [[saltedAgg]] is the classic two-phase shape: phase 1 aggregates on
  * (key, salt) — spreading the hot key over `saltBuckets` reducers —
  * phase 2 re-aggregates the per-salt partials on the key alone. Works
  * for any algebraic aggregate (sum/count/min/max); the caller supplies
  * both the partial and the merge expression per output column.
  */
object Skew {

  final case class SaltedCol(partial: Column, merge: String => Column, name: String)

  /** sum(x) decomposed for two-phase aggregation. */
  def saltedSum(c: Column, name: String): SaltedCol =
    SaltedCol(sum(c).as(name), p => sum(col(p)).as(name), name)

  /** count(*) decomposed (partial counts merge by summing). */
  def saltedCount(name: String): SaltedCol =
    SaltedCol(count(lit(1)).as(name), p => sum(col(p)).as(name), name)

  def saltedMin(c: Column, name: String): SaltedCol =
    SaltedCol(min(c).as(name), p => min(col(p)).as(name), name)

  def saltedMax(c: Column, name: String): SaltedCol =
    SaltedCol(max(c).as(name), p => max(col(p)).as(name), name)

  /** Two-phase salted aggregation over `keys`, semantically identical to
    * `df.groupBy(keys).agg(...)` for algebraic aggregates.
    *
    * `saltFrom` must be a DETERMINISTIC per-row expression that spreads
    * the hot key's rows — typically a unique id column (`event_id`), or
    * any high-cardinality column distinct from the grouping keys. A
    * nondeterministic salt (row id, rand) would be recomputed differently
    * when a task retries after a shuffle-fetch failure, letting reducers
    * holding a mix of old and recomputed map outputs double-count or
    * drop rows (the SPARK-23207 class of bug). Hashing `saltFrom` keeps
    * the assignment uniform across duplicate hot-key rows AND stable
    * under recomputation.
    *
    * `saltFrom` should also be NON-NULL on (at least) the hot key's
    * rows: every NULL hashes to the same constant, so a hot key whose
    * salt column is largely null re-concentrates into one bucket — the
    * straggler this operator exists to remove. Results stay correct
    * either way; only the skew mitigation degrades. If the natural salt
    * column is nullable, coalesce it with a secondary deterministic
    * expression, e.g. `coalesce(col("event_id"), col("ts"))`. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      saltFrom: Column, cols: SaltedCol*): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(cols.head.partial, cols.tail.map(_.partial): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(cols.head.merge(cols.head.name), cols.tail.map(c => c.merge(c.name)): _*)
  }
}
