package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily event-rate anomaly sheet — the operational monitoring staple
  * over an event log: per (series, day) volumes against a trailing
  * baseline of the preceding `baselineDays` OBSERVED days, with an
  * exactly-reproducible deviation ratio and a rational spike flag.
  *
  * All arithmetic is integer: the deviation ratio is
  * `floor(n · baselineDays · 2^20 / trail_sum)` (one BIGINT floor
  * division — no doubles anywhere), and the spike test
  * `n > (num/den) · mean` is cross-multiplied to
  * `n · den · baselineDays > num · trail_sum`, so the sheet oracles
  * bitwise. Days with an incomplete baseline report ratio −1 and
  * never flag (a cold series must earn its baseline first).
  *
  * Scale shape: one map-side-combined (series, day) count aggregation
  * over the raw log, then ONE window partitioned by series over the
  * post-aggregation frame — at most days×series rows, so the window
  * sort is trivially small no matter how large the log. The frame is
  * ROWS-based over observed days: a silent series contributes nothing
  * to its own baseline (gaps don't zero-fill), the deterministic
  * convention for sparse series.
  */
object Anomaly {

  private val Q = 1048576L // 2^20 ratio quantizer

  /** One row per (series, day): `(seriesCol, day, n_events,
    * trail_days, trail_sum, ratio_q, is_spike)`. `num/den` is the
    * spike threshold as a ratio to the trailing mean (3/2 = fire at
    * 1.5× baseline). Null timestamps are dropped (the q52/q62
    * convention). */
  def dailySpikes(events: DataFrame, seriesCol: String, tsCol: String,
      baselineDays: Int = 7, num: Long = 3L, den: Long = 2L): DataFrame = {
    require(baselineDays > 0, s"baselineDays must be positive, got $baselineDays")
    require(num > 0 && den > 0, s"threshold num/den must be positive, got $num/$den")
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(col(seriesCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val trail = Window.partitionBy(col(seriesCol)).orderBy(col("day"))
      .rowsBetween(-baselineDays, -1)
    daily
      .withColumn("trail_days", count(lit(1)).over(trail))
      .withColumn("trail_sum", coalesce(sum(col("n_events")).over(trail), lit(0L)))
      .withColumn("ratio_q", when(col("trail_days") === baselineDays,
        expr(s"CAST((n_events * $baselineDays * $Q) DIV trail_sum AS BIGINT)"))
        .otherwise(lit(-1L)))
      .withColumn("is_spike", when(col("trail_days") === baselineDays &&
          col("n_events") * (den * baselineDays) > col("trail_sum") * num,
        lit(1L)).otherwise(lit(0L)))
  }
}
