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

  /** Label-separation sheet — the supervised health audit a
    * classifier-data pipeline runs before training on labeled
    * embeddings (and the reading behind "are these labels worth
    * learning"): per unordered label pair, the exact-integer dot of
    * the two QUANTIZED class centroids and its cosine; per label
    * (diagonal rows), the within-class scatter. Well-separated labels
    * read low off-diagonal |cos| with small `within_q`; a pair at
    * cos ≈ 1 is two names for one cluster (merge or relabel); a label
    * whose `within_q` rivals its centroid energy is noise, not a
    * class (the Fisher-discriminant reading, assembled from exact
    * integer parts).
    *
    * Determinism design: per-row squared norms are `graft_dot` (the
    * q30/q94 bitwise contract) floor-quantized ×2^20; per-dimension
    * component sums quantize floor(·2^20) per TERM (the q127
    * convention — exact BIGINTs, partition-invariant); the quantized
    * centroid is a trunc-toward-zero division through an explicit
    * sign CASE (Spark DIV truncates, DuckDB // floors — the CASE
    * makes both engines compute the same value on negative sums);
    * centroid dots are pure BIGINT sums; the closing cosine is one
    * IEEE division over two correctly-rounded sqrts of exact BIGINTs
    * (the q152 one-IEEE-op rule). Headroom: needs n·max|v|·2^20 <
    * 2^63 per (label, dim) — at 2^40 vectors per label and |v| ≤ 4
    * the sum sits at 2^62.
    *
    * Output: one row per unordered label pair (diagonal included) —
    * `(lab_a, lab_b, n_a, n_b, dot_c_q, cos_c, within_q)`; `dot_c_q`
    * in 2^40 units, `within_q` (diagonal only, −1 off-diagonal, the
    * q90 idiom) = mean ‖v‖² − ‖μ_q‖² in 2^20 units, clamped at 0
    * against quantization undershoot. Null / ragged / non-finite /
    * unlabeled vectors are excluded (the [[healthSheet]] gate finds
    * those).
    *
    * Scale shape (100 TB): ONE corpus pass; the only corpus-driven
    * exchanges are the (label, dim)-keyed component sums and the
    * label-keyed count/norm stats — both map-side combined, both
    * collapsing to labels-sized frames; everything after (centroid
    * division, the pair self-join on 64 dim keys, the closing
    * cosine) touches labels × dim rows, broadcast throughout. */
  def labelSeparationSheet(embs: DataFrame, dim: Int,
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    graft.GraftSession.ensureConfs(embs.sparkSession)
    val v = col(vecCol).cast("array<double>")
    val base = embs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim &&
        col(labelCol).isNotNull)
      .select(col(labelCol).cast("long").as("label"), v.as("v"),
        graft.operators.Similarity.dot(v, v).as("n2"))
      .filter(!isnan(col("n2")) && abs(col("n2")) =!= Double.PositiveInfinity)
    val stats = Dedup.materialize(base.groupBy(col("label")).agg(
      count(lit(1)).as("n"),
      sum(floor(col("n2") * Q).cast("long")).as("ssq_q")))
    val sums = base
      .select(col("label"), posexplode(col("v")).as(Seq("d", "x")))
      .select(col("label"), col("d"), floor(col("x") * Q).cast("long").as("xq"))
      .groupBy(col("label"), col("d")).agg(sum(col("xq")).as("s"))
    val ml = Dedup.materialize(sums
      .join(broadcast(stats.select(col("label"), col("n"))), "label")
      .select(col("label"), col("d"),
        expr("CASE WHEN s >= 0 THEN s DIV n ELSE -((-s) DIV n) END").as("m")))
    // broadcast the self-join's build side: ml is labels × dim rows of
    // an ExistingRDD (no stats) — unhinted, Spark sort-merges it
    // against itself
    val pairs = ml.select(col("label").as("lab_a"), col("d"), col("m").as("ma"))
      .join(broadcast(ml.select(col("label").as("lab_b"), col("d"), col("m").as("mb"))), "d")
      .filter(col("lab_a") <= col("lab_b"))
      .groupBy(col("lab_a"), col("lab_b"))
      .agg(sum(col("ma") * col("mb")).as("dot_c_q"))
    val selfdot = ml.groupBy(col("label")).agg(sum(col("m") * col("m")).as("selfq"))
    pairs
      .join(broadcast(stats.select(col("label").as("lab_a"),
        col("n").as("n_a"), col("ssq_q").as("ssq_a"))), "lab_a")
      .join(broadcast(stats.select(col("label").as("lab_b"),
        col("n").as("n_b"))), "lab_b")
      .join(broadcast(selfdot.select(col("label").as("lab_a"),
        col("selfq").as("__aa"))), "lab_a")
      .join(broadcast(selfdot.select(col("label").as("lab_b"),
        col("selfq").as("__bb"))), "lab_b")
      .select(col("lab_a"), col("lab_b"), col("n_a"), col("n_b"),
        col("dot_c_q"),
        when(col("__aa") > 0L && col("__bb") > 0L,
          col("dot_c_q").cast("double") /
            (sqrt(col("__aa").cast("double")) * sqrt(col("__bb").cast("double"))))
          .otherwise(lit(0.0)).as("cos_c"),
        when(col("lab_a") === col("lab_b"),
          greatest(lit(0L), expr(
            "CAST(ssq_a DIV n_a AS BIGINT) - CAST(__aa DIV 1048576 AS BIGINT)")))
          .otherwise(lit(-1L)).as("within_q"))
  }
}
