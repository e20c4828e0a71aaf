package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group multi-quantile in ONE sort pass.
  *
  * `percentile_disc(q) WITHIN GROUP (ORDER BY x)` selects the smallest
  * x whose cumulative distribution reaches q — equivalently the value
  * at 1-based rank `ceil(q·n)` of the group's ascending sort. Stacking
  * k percentile_disc aggregates in one groupBy makes Spark buffer the
  * group's values k times in k interpreted ObjectHashAggregate
  * buffers; this operator instead sorts each group ONCE (a single
  * codegen'd window sort — one shuffle on the group key) and picks all
  * k ranks from that ordering with a plain conditional aggregation.
  *
  * Scale shape: exact per-group quantiles inherently serialize each
  * GROUP through one task (any implementation must see a group's full
  * ordering); within that bound this form strictly dominates the
  * buffered aggregates — the per-task sort is external (spills to
  * disk) where the k buffers are in-memory only, and the rank is
  * BIGINT (a running count, not IntegerType row_number) so groups
  * beyond 2³¹ rows rank correctly instead of overflowing. For group
  * counts in the thousands-and-up (the q60 shape: a handful of return
  * flags is the DEGENERATE case) tasks parallelize across groups; a
  * corpus whose single group exceeds one task's disk is what
  * approx_percentile is for (the error-bounded sheet in QuantileSpec).
  *
  * Result is bitwise identical to percentile_disc (discrete
  * selection, no interpolation arithmetic), so it oracle-compares
  * exactly cross-engine.
  *
  * Rows with NULL `valCol` are excluded (percentile_disc semantics);
  * `n_rows` therefore counts non-null values, and all-NULL groups are
  * absent from the output — oracles must mirror with
  * `WHERE val IS NOT NULL`.
  */
object Quantiles {

  /** One output row per group: `groupCol, <name_i>..., n_rows` where
    * `qs` maps output column name → percentile in (0, 1]. Each q must
    * be exactly representable in ≤ 10 decimal places (any practical
    * quantile is; a computed q like 1/3.0 is rejected rather than
    * silently reinterpreted). */
  def multiQuantileDisc(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      qs: Seq[(String, Double)]): DataFrame =
    multiQuantileDisc(df, Seq(groupCol), valCol, qs)

  /** Multi-column grouping variant: one output row per distinct
    * `groupCols` tuple (one shuffle on the compound key). */
  def multiQuantileDisc(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"percentiles must be in (0, 1]: $qs")
    require(qs.forall { case (_, q) => BigDecimal(q).scale <= 10 },
      s"percentiles must be exact in 10 decimal places (got $qs); " +
        "rank selection is decimal-exact and will not guess a rounding")
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val ordered = byGroup.orderBy(col(valCol))
    val ranked = df
      .select(groupCols.map(col) :+ col(valCol): _*)
      .filter(col(valCol).isNotNull)
      // BIGINT 1-based rank: a running count over the ROWS frame — the
      // same ordering row_number() would give, without its Int ceiling;
      // tied values share ranks' VALUES so the pick stays deterministic
      .withColumn("__rn", count(lit(1)).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(byGroup))
    val picks: Seq[Column] = qs.map { case (name, q) =>
      // the rank pick is DECIMAL-exact: in double arithmetic
      // 0.07 * 100 = 7.000000000000001, whose ceil silently selects
      // rank 8 where percentile_disc's exact rational ceil(q·n) = 7.
      // decimal(11,10) × decimal(20,0) → decimal(32,10) is exact for
      // any group size, so ceil lands on the true rank
      val qExact = lit(BigDecimal(q).setScale(10).underlying())
      max(when(col("__rn") === ceil(qExact * col("__n")), col(valCol))).as(name)
    }
    ranked.groupBy(groupCols.map(col): _*)
      .agg(picks.head, picks.tail :+ max(col("__n")).as("n_rows"): _*)
  }
}
