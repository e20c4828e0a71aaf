package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Within-document chunking — the RAG/context-window splitter
  * (complementing [[SequencePack]]'s cross-document concat-and-chop):
  * each document becomes overlapping `width`-token chunks starting
  * every `stride` tokens, emitted as (id, chunk_idx, chunk_text,
  * n_chunk_tokens); the final chunk keeps its natural shorter length.
  *
  * Parameter semantics: `stride < width` overlaps consecutive chunks
  * by `width - stride` tokens (the no-lost-boundary-context setting);
  * `stride == width` partitions the token stream exactly; `stride >
  * width` is allowed but SKIPS `stride - width` tokens between chunks
  * — legal for sampling-style readers, and exercised in ChunkingSpec
  * so the semantics stay pinned rather than accidental.
  *
  * Scale shape: pure map-side — explode over a per-doc start sequence
  * (⌈|tokens|/stride⌉ elements) then slice + join from the bound token
  * array; ZERO shuffles, no window; chunk_idx arithmetic is exact in
  * any engine because starts are 1 + k·stride by construction.
  * (q79 is this operator at width=32, stride=24.)
  */
object Chunking {

  /** Split `textCol` of each row into whitespace tokens and emit one
    * row per chunk. A whitespace-only/empty text still yields one
    * (empty) chunk — `split` never returns a zero-length array — and
    * NULL text coalesces to empty FIRST (explode would otherwise drop
    * the row), so every input doc is represented downstream. */
  def chunkDocuments(docs: DataFrame, width: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(width > 0, s"chunk width must be positive, got $width")
    require(stride > 0, s"chunk stride must be positive, got $stride")
    docs
      .select(col(idCol),
        TextFunctions.rawTokens(coalesce(col(textCol), lit(""))).as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(1), size(col("toks")), lit(stride))).as("start"))
      .select(col(idCol),
        ((col("start") - 1) / stride).cast("long").as("chunk_idx"),
        array_join(slice(col("toks"), col("start"), lit(width)), " ").as("chunk_text"),
        (least(col("start") + (width - 1), size(col("toks"))) - col("start") + 1)
          .cast("long").as("n_chunk_tokens"))
  }
}
