package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: concatenate the corpus in a
  * deterministic order (ascending doc id) and chop the token stream
  * into fixed-`capacity` training sequences; each document maps to the
  * pack where its first token lands, the pack where its last token
  * lands, and how many packs it spans (boundary-crossing documents are
  * the ones a loader must split or pad around).
  *
  * The kernel is an exclusive prefix sum of token counts in id order.
  * A single global window (`ORDER BY doc_id` with no partition) would
  * serialize the whole corpus through one task, so the prefix sum is
  * two-level: (1) per-bucket subtotals (`doc_id div bucketWidth` — one
  * map-side-combinable groupBy), (2) an exclusive running sum over the
  * TINY bucket-subtotal frame (corpus/bucketWidth rows — the only
  * single-partition window, millions of rows at 100 TB, not billions),
  * broadcast-joined back, (3) an intra-bucket exclusive window sum.
  * Integer arithmetic end-to-end, so the two-level decomposition is
  * bitwise identical to the global scan an oracle runs.
  */
object SequencePack {

  /** One row per document: (doc_id, n_tokens, pack_first, pack_last,
    * packs_spanned). `nTokensCol` must be a non-negative BIGINT column
    * of `docs`; zero-token documents occupy (zero-width) their start
    * pack. Rows with NULL id are dropped — they have no position in
    * the concatenation order. */
  def packAssignments(
      docs: DataFrame,
      idCol: String,
      nTokensCol: String,
      capacity: Long,
      bucketWidth: Long = 8192L): DataFrame = {
    require(capacity > 0, s"pack capacity must be positive: $capacity")
    require(bucketWidth > 0, s"bucket width must be positive: $bucketWidth")
    val t = docs
      .select(col(idCol).cast("long").as("doc_id"), col(nTokensCol).cast("long").as("n_tokens"))
      .filter(col("doc_id").isNotNull)
      // enforce the non-negative contract at execution time without an
      // extra validation pass: the error branch is dead code on valid
      // data (a negative count would silently corrupt every LATER
      // document's pack assignment through the prefix sums)
      // NULL also lands here (NULL >= 0 is NULL, not true) — a NULL
      // count has no defined width in the concatenation either
      .withColumn("n_tokens",
        when(col("n_tokens") >= 0L, col("n_tokens")).otherwise(raise_error(concat(
          lit("negative or NULL n_tokens for doc_id="),
          coalesce(col("doc_id").cast("string"), lit("NULL")))).cast("long")))
      .withColumn("__b", expr("doc_id div " + bucketWidth))
    val subtotals = t.groupBy(col("__b")).agg(sum(col("n_tokens")).as("__bt"))
    val exclusiveBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("__off", coalesce(sum(col("__bt")).over(exclusiveBuckets), lit(0L)))
      .select(col("__b"), col("__off"))
    val exclusiveInBucket = Window.partitionBy(col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(offsets), "__b")
      .withColumn("__cb",
        col("__off") + coalesce(sum(col("n_tokens")).over(exclusiveInBucket), lit(0L)))
      .select(
        col("doc_id"),
        col("n_tokens"),
        expr(s"__cb div $capacity").as("pack_first"),
        expr(s"(__cb + greatest(n_tokens, 1L) - 1L) div $capacity").as("pack_last"))
      .withColumn("packs_spanned", col("pack_last") - col("pack_first") + lit(1L))
  }

  /** Training-shard manifest over [[packAssignments]] — the writer's
    * work order: packs grouped `packsPerShard` at a time into shards,
    * one row per shard with the document count, token mass, widest
    * document span, and how many documents CROSS the shard's trailing
    * boundary (each crosser is a doc the writer must either split or
    * shift — the number to minimize when tuning capacity). A document
    * belongs to the shard where it STARTS (`pack_first`), so every doc
    * counts exactly once and the manifest partitions the corpus.
    *
    * All columns are BIGINT counts over q65's already-oracled exact
    * integer relation — bitwise-oracled by construction. Scale shape:
    * [[packAssignments]]' audited plan plus ONE map-side-combined
    * count onto the small shard key; nothing new touches corpus rows. */
  def shardManifest(docs: DataFrame, idCol: String, nTokensCol: String,
      capacity: Long, packsPerShard: Long,
      bucketWidth: Long = 8192L): DataFrame = {
    require(packsPerShard > 0, s"packsPerShard must be positive: $packsPerShard")
    packAssignments(docs, idCol, nTokensCol, capacity, bucketWidth)
      .withColumn("shard", expr(s"pack_first div $packsPerShard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        max(col("packs_spanned")).as("max_span"),
        sum(when(expr(s"pack_last div $packsPerShard") =!= col("shard"), 1L)
          .otherwise(0L)).as("boundary_crossers"))
  }

  /** Shard manifest over the INTERLEAVED training order — the packing
    * step a trainer actually runs after [[graft.operators.Mixing
    * .interleaveManifest]]: concatenate the epoch-appearances in
    * `(pos_key, group, appearance)` order (the q170 stride order, so
    * every shard inherits the mixture guarantee — packing doc-id order
    * instead would hand each shard a provenance-sorted slab) and chop
    * into `capacity`-token packs grouped `packsPerShard` per shard.
    * One row per shard: appearance count, token mass, widest
    * appearance span, trailing-boundary crossers (the q99 sheet
    * shape), plus `n_sources` — the distinct groups the shard carries,
    * the column that SHOWS the interleave landed (a doc-id-order pack
    * of a source-clustered corpus reads 1 here; the stride order reads
    * ~every allocated group in every shard).
    *
    * The prefix sum is the q65 two-level kernel over the GRID
    * coordinate: buckets are `pos_key DIV 2^42` (≤ 2^20 bucket
    * subtotals — the only single-partition window, millions of rows
    * at any budget, never appearance-count-sized), intra-bucket
    * windows order by the full `(pos_key, group, appearance)` total
    * order. Integer end-to-end, so the decomposition is bitwise the
    * global scan the oracle runs.
    *
    * Input: a [[graft.operators.Mixing.interleaveManifest]] output
    * frame (needs `groupCol`, `n_tokens`, `appearance`, `pos_key`).
    * Scale shape: the manifest's audited plan + ONE bucket-keyed
    * exchange for the prefix sum (budget-bounded rows) + a map-side
    * shard rollup; the distinct-source count is a two-level
    * (shard, group) collapse, map-side combined. */
  def interleavedShardManifest(manifest: DataFrame, groupCol: String,
      capacity: Long, packsPerShard: Long): DataFrame = {
    require(capacity > 0, s"pack capacity must be positive: $capacity")
    require(packsPerShard > 0, s"packsPerShard must be positive: $packsPerShard")
    // materialize: `t` feeds BOTH the bucket-subtotal branch and the
    // assignment join, and Spark does not share the common subtree —
    // without this the whole upstream manifest chain (quota pass +
    // ranking window) would run twice (the q161 scored-frame
    // convention)
    val t = Dedup.materialize(manifest
      .select(col(groupCol).as("__g"), col("appearance"), col("pos_key"),
        col("n_tokens").cast("long").as("n_tokens"))
      // NULL also lands here (NULL >= 0 is NULL, not true):
      // interleaveManifest guarantees non-null sizes only for its own
      // outputs, not for caller-built frames
      .withColumn("n_tokens",
        when(col("n_tokens") >= 0L, col("n_tokens")).otherwise(raise_error(concat(
          lit("negative or NULL n_tokens at appearance="),
          coalesce(col("appearance").cast("string"), lit("NULL")))).cast("long")))
      .withColumn("__b", expr("pos_key div 4398046511104"))) // 2^42
    val subtotals = t.groupBy(col("__b")).agg(sum(col("n_tokens")).as("__bt"))
    val exclusiveBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("__off", coalesce(sum(col("__bt")).over(exclusiveBuckets), lit(0L)))
      .select(col("__b"), col("__off"))
    val exclusiveInBucket = Window.partitionBy(col("__b"))
      .orderBy(col("pos_key"), col("__g"), col("appearance"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(offsets), "__b")
      .withColumn("__cb",
        col("__off") + coalesce(sum(col("n_tokens")).over(exclusiveInBucket), lit(0L)))
      .select(col("__g"), col("n_tokens"),
        expr(s"__cb div $capacity").as("pack_first"),
        expr(s"(__cb + greatest(n_tokens, 1L) - 1L) div $capacity").as("pack_last"))
      .withColumn("shard", expr(s"pack_first div $packsPerShard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_appearances"),
        sum(col("n_tokens")).as("n_tokens"),
        max(col("pack_last") - col("pack_first") + lit(1L)).as("max_span"),
        sum(when(expr(s"pack_last div $packsPerShard") =!= col("shard"), 1L)
          .otherwise(0L)).as("boundary_crossers"),
        countDistinct(col("__g")).cast("long").as("n_sources"))
  }

  /** [[interleavedShardManifest]] for a PHASED (curriculum) order —
    * the packing step a trainer runs after q177/q183: pack and shard
    * numbering RESTART at every phase boundary, so no shard ever
    * spans two phases — a curriculum whose phase 0 must finish before
    * phase 1 begins cannot be served by a shard that mixes both (the
    * phase-agnostic kernel would happily pack the last appearances of
    * one phase with the first of the next into one shard; a trainer
    * honoring phase boundaries would then have to split that shard
    * itself). The phase derives from the manifest's own grid
    * coordinate — `phase = pos_key DIV (2^62 DIV nPhases)`, the
    * phase-major slice every phased interleave mints — so any
    * phase-major manifest packs correctly without carrying an
    * explicit phase column.
    *
    * Output: one row per (phase, shard) — the [[interleavedShardManifest]]
    * census columns keyed by phase; shard ids are per-phase ordinals.
    * At `nPhases = 1` bitwise the phase-agnostic kernel plus the
    * constant phase 0 (SequencePackSpec pins it — the cap=∞
    * convention).
    *
    * Scale shape: identical to [[interleavedShardManifest]] with
    * every prefix-sum key widened to (phase, bucket) — the two-level
    * kernel's bucket frame stays ≤ 2^20 rows (buckets are global
    * grid coordinates; a bucket straddling a phase boundary splits
    * into its two (phase, bucket) groups), and the per-phase offsets
    * broadcast. */
  def phasedShardManifest(manifest: DataFrame, groupCol: String,
      capacity: Long, packsPerShard: Long, nPhases: Int): DataFrame = {
    require(capacity > 0, s"pack capacity must be positive: $capacity")
    require(packsPerShard > 0, s"packsPerShard must be positive: $packsPerShard")
    require(nPhases >= 1, s"nPhases must be positive: $nPhases")
    val slice = 4611686018427387904L / nPhases
    val t = Dedup.materialize(manifest
      .select(col(groupCol).as("__g"), col("appearance"), col("pos_key"),
        col("n_tokens").cast("long").as("n_tokens"))
      .withColumn("n_tokens",
        when(col("n_tokens") >= 0L, col("n_tokens")).otherwise(raise_error(concat(
          lit("negative or NULL n_tokens at appearance="),
          coalesce(col("appearance").cast("string"), lit("NULL")))).cast("long")))
      .withColumn("__p", expr(s"pos_key div $slice"))
      .withColumn("__b", expr("pos_key div 4398046511104"))) // 2^42
    val subtotals = t.groupBy(col("__p"), col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"))
    val exclusiveBuckets = Window.partitionBy(col("__p")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("__off", coalesce(sum(col("__bt")).over(exclusiveBuckets), lit(0L)))
      .select(col("__p"), col("__b"), col("__off"))
    val exclusiveInBucket = Window.partitionBy(col("__p"), col("__b"))
      .orderBy(col("pos_key"), col("__g"), col("appearance"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(offsets), Seq("__p", "__b"))
      .withColumn("__cb",
        col("__off") + coalesce(sum(col("n_tokens")).over(exclusiveInBucket), lit(0L)))
      .select(col("__p").as("phase"), col("__g"), col("n_tokens"),
        expr(s"__cb div $capacity").as("pack_first"),
        expr(s"(__cb + greatest(n_tokens, 1L) - 1L) div $capacity").as("pack_last"))
      .withColumn("shard", expr(s"pack_first div $packsPerShard"))
      .groupBy(col("phase"), col("shard"))
      .agg(count(lit(1)).as("n_appearances"),
        sum(col("n_tokens")).as("n_tokens"),
        max(col("pack_last") - col("pack_first") + lit(1L)).as("max_span"),
        sum(when(expr(s"pack_last div $packsPerShard") =!= col("shard"), 1L)
          .otherwise(0L)).as("boundary_crossers"),
        countDistinct(col("__g")).cast("long").as("n_sources"))
  }
}
