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
  * Scale shape (100 TB): one hash-partition + per-partition sort of
  * (group, value) pairs, then a map-side-combinable agg of one row per
  * group — strictly less memory than k value-buffering aggregates,
  * and the sort spills where a buffered agg OOMs. Result is bitwise
  * identical to percentile_disc (discrete selection, no interpolation
  * arithmetic), so it oracle-compares exactly cross-engine.
  *
  * Rows with NULL `valCol` are excluded (percentile_disc semantics);
  * `n_rows` therefore counts non-null values.
  */
object Quantiles {

  /** One output row per group: `groupCol, <name_i>..., n_rows` where
    * `qs` maps output column name → percentile in (0, 1]. */
  def multiQuantileDisc(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"percentiles must be in (0, 1]: $qs")
    val byGroup = Window.partitionBy(groupCol)
    val ranked = df
      .select(col(groupCol), col(valCol))
      .filter(col(valCol).isNotNull)
      .withColumn("__rn", row_number().over(byGroup.orderBy(col(valCol))))
      .withColumn("__n", count(lit(1)).over(byGroup))
    val picks: Seq[Column] = qs.map { case (name, q) =>
      max(when(col("__rn") === ceil(lit(q) * col("__n")), col(valCol))).as(name)
    }
    ranked.groupBy(col(groupCol))
      .agg(picks.head, picks.tail :+ max(col("__n")).as("n_rows"): _*)
  }
}
