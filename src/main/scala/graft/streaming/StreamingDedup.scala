package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming face of the dedup family ([[graft.operators.Dedup]] is the
  * batch side): exact dedup over an unbounded stream with BOUNDED state.
  *
  * `dropDuplicates` on a stream keeps every key ever seen — state grows
  * without bound, which is exactly what breaks at 100 TB/day. The
  * watermark variant keeps a key only until the watermark passes its
  * event time + delay: duplicates arriving within the delay are
  * suppressed, state for older keys is evicted. The trade is explicit
  * and the right one for pipeline ingestion: a duplicate arriving later
  * than `delay` re-emits (downstream idempotent upsert —
  * [[graft.sinks.UpsertWriter]] — absorbs it), in exchange for state
  * proportional to the delay window instead of the stream's lifetime. */
object StreamingDedup {

  /** Exact dedup on `keys` within the watermark delay on `eventTimeCol`.
    * Works on streaming frames; on batch frames it degrades to plain
    * dropDuplicates semantics for the same keys. */
  def dedupWithinWatermark(df: DataFrame, eventTimeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
