package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary drift between two corpus slices — the crawl-monitoring
  * step of a training-data pipeline: compare per-term occurrence RATES
  * (not raw counts — slices differ in size) between a reference slice
  * A and a candidate slice B (consecutive crawl snapshots, two
  * sources, pre/post a filter change), and flag terms whose rate moved
  * by more than a threshold factor in either direction. A sudden
  * up-drift marks template/boilerplate injection or a scraper bug; a
  * down-drift marks lost coverage. This is the distribution-shift
  * guard that runs BEFORE a new snapshot is allowed into the mix
  * (complement of [[Mixing]], which reweights already-admitted
  * sources, and of [[Anomaly]], which watches event volumes, not
  * vocabulary).
  *
  * Determinism design (the QuerySpec contract): the rate ratio
  * `(cnt_b/N_b) / (cnt_a/N_a)` is quantized as one BIGINT floor
  * division `(cnt_b · N_a · 2^20) div (cnt_a · N_b)` and the
  * drift tests cross-multiply (`cnt_b · N_a · den > cnt_a · N_b ·
  * num` and its mirror) — all integer, so every column oracles
  * bitwise (the q90 idiom). Terms absent from A report ratio −1 (new
  * vocabulary cannot be rated against a zero base) but still
  * drift-flag upward; terms absent from B flag downward.
  *
  * Scale shape: ONE corpus scan — tokens explode map-side, the
  * (term, slice-membership) counts collapse in a single map-side-
  * combined aggregation keyed on term (conditional sums, not a
  * per-slice re-scan), and slice totals attach via an unpartitioned
  * window over the vocab-sized frame (the q89 idiom — no second
  * corpus pass). Nothing after the one exchange exceeds vocab rows.
  */
object Drift {

  private val Q = 1048576L // 2^20 ratio quantizer

  /** One row per term with `cnt_a + cnt_b ≥ minTotal`:
    * `(term, cnt_a, cnt_b, ratio_q, drift_dir)` where `drift_dir` is
    * +1 (B's rate > num/den × A's), −1 (A's rate > num/den × B's), or
    * 0 (stable). `inA` selects slice-A rows; rows in neither slice
    * are excluded by `inB=false` semantics — pass complementary
    * predicates for a full split. Null text contributes nothing (the
    * q81 totality convention). */
  def termDrift(docs: DataFrame, textCol: String, inA: Column,
      minTotal: Long = 10L, num: Long = 3L, den: Long = 2L): DataFrame = {
    require(minTotal >= 1, s"minTotal must be >= 1, got $minTotal")
    require(num > den && den > 0, s"threshold num/den must exceed 1, got $num/$den")

    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val per = docs.filter(col(textCol).isNotNull)
      .select(inA.as("in_a"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("cnt_b"))
      .withColumn("n_a", sum(col("cnt_a")).over(whole))
      .withColumn("n_b", sum(col("cnt_b")).over(whole))

    per.filter(col("cnt_a") + col("cnt_b") >= minTotal)
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        when(col("cnt_a") > 0,
          expr(s"CAST((cnt_b * n_a * $Q) DIV (cnt_a * n_b) AS BIGINT)"))
          .otherwise(lit(-1L)).as("ratio_q"),
        when(col("cnt_b") * col("n_a") * den > col("cnt_a") * col("n_b") * num, lit(1L))
          .when(col("cnt_a") * col("n_b") * den > col("cnt_b") * col("n_a") * num, lit(-1L))
          .otherwise(lit(0L)).as("drift_dir"))
  }
}
