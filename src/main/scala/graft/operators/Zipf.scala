package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zipf rank–frequency audit — the corpus-health sheet beside the
  * drift monitors (q92/q144): natural language follows Zipf's law
  * (frequency ∝ rank^s with s ≈ −1 in log–log; Piantadosi 2014
  * surveys the evidence), and a corpus whose fitted slope drifts from
  * the reference band is telling you something structural — template
  * or boilerplate injection flattens the head (slope toward 0 over
  * the top ranks), deduplication bugs steepen it, OCR noise fattens
  * the tail. The sheet fits ordinary least squares over
  * (log2 rank, log2 count) for the TOP `fitRanks` vocabulary terms —
  * the head is where Zipf is sharpest and where injection shows
  * first, and the cap also bounds the integer sums (see below).
  *
  * Determinism design: term counts are BIGINTs; ranks are the exact
  * (count DESC, term ASC) row numbers; x = log2q(rank), y =
  * log2q(count) under the exact fixed-point [[Mixing.log2qExpr]]
  * kernel (1/64-log2 units); the OLS slope is emitted as the exact
  * integer pair `slope_num = n·Σxy − Σx·Σy`, `slope_den = n·Σx² −
  * (Σx)²` plus their single IEEE division (the q90 idiom) — the
  * whole row oracles bitwise. At fitRanks = 4096: x ≤ 64·12, y ≤
  * 64·63, so n·Σxy ≤ 4096²·768·4032 < 2^56 — no overflow for any
  * corpus size (counts enter only through log2q, total over the
  * BIGINT domain).
  *
  * Output: ONE row —
  * `(n_terms, n_tokens, n_fit, sum_x, sum_y, sum_xx, sum_xy,
  * slope_num, slope_den, slope)`; slope −0.0/NULL-free: fewer than 2
  * fit ranks yields slope_den = 0 and slope = −1.0 (undefined idiom).
  *
  * Scale shape (100 TB): tokens explode map-side and collapse onto
  * term keys in ONE map-side-combined aggregation (the q51 shape);
  * the rank window sorts the vocab-sized count frame once (vocab ≪
  * corpus — the q89 idiom); the fit touches `fitRanks` 24-byte rows
  * and closes in one single-row aggregate. */
object Zipf {

  def rankFrequencyFit(docs: DataFrame, textCol: String = "text",
      fitRanks: Int = 4096): DataFrame = {
    require(fitRanks >= 2 && fitRanks <= 65536,
      s"fitRanks must be in [2, 65536], got $fitRanks")
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val counts = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val ranked = counts
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy().orderBy(col("cnt").desc, col("w").asc)).cast("long"))
      .withColumn("n_terms", count(lit(1)).over(whole))
      .withColumn("n_tokens", sum(col("cnt")).over(whole))
    val fit = ranked.filter(col("rank") <= fitRanks)
      .withColumn("x", expr(Mixing.log2qExpr("rank")))
      .withColumn("y", expr(Mixing.log2qExpr("cnt")))
    fit.agg(
        max(col("n_terms")).as("n_terms"),
        max(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_fit"),
        sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("x") * col("y")).as("sum_xy"))
      .select(
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("n_fit"),
        coalesce(col("sum_x"), lit(0L)).as("sum_x"),
        coalesce(col("sum_y"), lit(0L)).as("sum_y"),
        coalesce(col("sum_xx"), lit(0L)).as("sum_xx"),
        coalesce(col("sum_xy"), lit(0L)).as("sum_xy"))
      .withColumn("slope_num",
        col("n_fit") * col("sum_xy") - col("sum_x") * col("sum_y"))
      .withColumn("slope_den",
        col("n_fit") * col("sum_xx") - col("sum_x") * col("sum_x"))
      .withColumn("slope",
        when(col("slope_den") === 0L, lit(-1.0))
          .otherwise(col("slope_num").cast("double") / col("slope_den")))
  }
}
