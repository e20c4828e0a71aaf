package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column health audit — the pre-index gate of a similarity
  * pipeline: before a corpus of vectors is admitted to an ANN index
  * ([[Similarity]]) or used for near-dup detection, scan once for the
  * failure modes that silently corrupt downstream geometry — null
  * vectors, ragged dimensions (a model-version mix-up), all-zero
  * vectors (an encoder that returned its padding output), and
  * non-finite norms (overflow/NaN from a bad batch). Per label-group
  * it also sheets the squared-norm distribution (min/max/mean), the
  * drift signal for "this batch came from a different checkpoint" —
  * unnormalized encoders shift their norm profile before they shift
  * their neighborhoods.
  *
  * Determinism design (the QuerySpec contract): the squared norm is
  * `graft_dot(v, v)` — the strict left-fold double accumulation that
  * is bitwise-equal to DuckDB's `list_dot_product` on `DOUBLE[]` (the
  * q30 contract, already verified bitwise by AnnOracle) — then
  * floor-quantized ×2^20 to BIGINT per ROW, so the per-group sums and
  * mean (one BIGINT floor division) are order-independent and the
  * sheet oracles bitwise. Non-finite norms are detected on the SAME
  * dot result (`isnan ∨ |n2| = ∞` — any NaN/Inf element poisons the
  * fold identically in both engines) and excluded from the quantized
  * stats; groups with no finite vector report −1 (the q90 idiom).
  *
  * Scale shape: ONE scan, one map-side-combined aggregation keyed on
  * the label — the dot product, quantization, and all predicates are
  * per-row map work inside WholeStageCodegen (`graft_dot` is a native
  * codegen Expression; no higher-order functions on this path), and
  * nothing after the single exchange exceeds group rows.
  */
object EmbeddingAudit {

  private val Q = 1048576L // 2^20 norm quantizer

  /** One row per label: `(label, n_vecs, n_null, dim_min, dim_max,
    * n_zero, n_nonfinite, norm_min_q, norm_max_q, norm_mean_q)`.
    * `n_vecs` counts all rows; null vectors count in `n_null` and
    * nothing else (size/dot of null are null and fall out of every
    * aggregate); `dim_min ≠ dim_max` flags ragged dimensions;
    * `n_zero` counts exact all-zero vectors (norm² = 0, finite).
    * Quantized norm stats cover finite-norm vectors only; a label
    * with none reports −1 in all three. */
  def healthSheet(embs: DataFrame, vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val n2 = graft.operators.Similarity.dot(v, v)
    val finite = !isnan(n2) && abs(n2) =!= Double.PositiveInfinity
    val perRow = embs.select(
      col(labelCol).cast("long").as("label"),
      col(vecCol).isNull.as("is_null"),
      size(v).cast("long").as("dim"),
      (n2 === 0.0).as("is_zero"),
      (!finite).as("is_nonfinite"),
      when(finite, floor(n2 * Q).cast("long")).as("n2_q"))

    perRow.groupBy(col("label")).agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("is_null"), 1L).otherwise(0L)).as("n_null"),
        min(col("dim")).as("dim_min"),
        max(col("dim")).as("dim_max"),
        sum(when(col("is_zero"), 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("is_nonfinite"), 1L).otherwise(0L)).as("n_nonfinite"),
        min(col("n2_q")).as("min_q"),
        max(col("n2_q")).as("max_q"),
        sum(col("n2_q")).as("sum_q"),
        count(col("n2_q")).as("n_finite"))
      .select(col("label"), col("n_vecs"), col("n_null"),
        col("dim_min"), col("dim_max"), col("n_zero"), col("n_nonfinite"),
        coalesce(col("min_q"), lit(-1L)).as("norm_min_q"),
        coalesce(col("max_q"), lit(-1L)).as("norm_max_q"),
        when(col("n_finite") > 0, expr("CAST(sum_q DIV n_finite AS BIGINT)"))
          .otherwise(lit(-1L)).as("norm_mean_q"))
  }
}
