package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join — Spark has no optimized range join: a
  * naive `a.join(b, key && b.t between a.t and a.t + gap)` plans as a
  * per-key join followed by a filter, which is the per-key cross
  * product and dies on hot keys at 100 TB.
  *
  * The banded form bounds the work: bucket both sides by the gap width
  * (`bucket = floor(time / gap)`), have the a-side probe its own and
  * the NEXT bucket (any b within (a.t, a.t+gap] lives in one of the
  * two), join on (key, bucket), then apply the exact range predicate.
  * Each qualifying pair is found exactly once — b's bucket is unique
  * and a's two probe buckets are distinct — so no dedup pass. Join
  * fan-out is bounded by bucket population, not key population. */
object RangeJoin {

  /** Self-pairs of `df` rows with equal `key` whose times are within
    * `maxGapSeconds`, time-ordered (ties at equal time ordered by
    * `idCol`). Returns (key, a_id, b_id, a_ts, b_ts, gap_us).
    *
    * @param df     input with `key`, a timestamp `timeCol`, and a unique
    *               `idCol` (the deterministic tiebreak for equal times) */
  def timeWindowPairs(df: DataFrame, key: String, timeCol: String, idCol: String,
      maxGapSeconds: Long): DataFrame = {
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive, got $maxGapSeconds")
    val g = maxGapSeconds * 1000000L // bucket width in microseconds
    val base = df.select(col(key), col(idCol).as("id"), col(timeCol).as("t"))
      .withColumn("us", unix_micros(col("t")))
      // integer div, not floor(us / g): long/long division in Spark is
      // DOUBLE division, whose 1-ulp boundary rounding could misbucket a
      // row once us·ε exceeds 1/g — `div` is exact at any magnitude
      .withColumn("bucket0", expr(s"us div ${g}L"))
    val a = base.select(col(key), col("id").as("a_id"), col("t").as("a_ts"),
        col("us").as("a_us"),
        explode(array(col("bucket0"), col("bucket0") + 1)).as("bucket"))
    val b = base.select(col(key), col("id").as("b_id"), col("t").as("b_ts"),
      col("us").as("b_us"), col("bucket0").as("bucket"))
    a.join(b, Seq(key, "bucket"))
      .filter(col("b_us") >= col("a_us") && col("b_us") <= col("a_us") + g &&
        (col("b_us") > col("a_us") || col("b_id") > col("a_id")))
      .select(col(key), col("a_id"), col("b_id"), col("a_ts"), col("b_ts"),
        (col("b_us") - col("a_us")).as("gap_us"))
  }
}
