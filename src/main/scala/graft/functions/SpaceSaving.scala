package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy hitters (Metwally et al., ICDT'05) as a typed
  * [[Aggregator]] — the at-scale complement to q51's exact term stats:
  * exact per-term counting over a trillion-token corpus is a fine
  * shuffle (map-side combined), but a TOP-K-ONLY consumer can replace
  * the full (term → count) materialization with a k-bounded mergeable
  * summary whose state is O(k) per partition regardless of vocabulary
  * size.
  *
  * Guarantees: within one partition the classical bounds hold (every
  * estimate overestimates its true count by ≤ N_p/m; any item with
  * partition frequency > N_p/m is present). The cross-partition merge
  * sums counts and truncates back to m (the mergeable-summaries
  * construction), which keeps estimates within O(N/m) of truth but can
  * drop a key a single partition saw rarely — so the bound the spec
  * enforces is the end-to-end one that survives ANY merge order:
  * every sufficiently-heavy term (freq > 2N/m) is present and every
  * reported count is within N/m of its exact value, checked against
  * q51's exact counts on the driver corpus at multiple partitionings.
  *
  * The exact values are NOT cross-engine reproducible (they depend on
  * arrival order), which is why this ships as a spec-bounded Aggregator
  * rather than an oracled query — the oracled exact counterpart is q51.
  */
object SpaceSaving {

  /** Summary entry: estimated count and maximum overestimation. */
  final case class Entry(count: Long, err: Long)

  type Buf = Map[String, Entry]

  /** Aggregator with capacity `m`: state is a ≤ m-entry map. */
  final case class TopKAgg(m: Int) extends Aggregator[String, Buf, Map[String, Long]] {
    require(m > 0, "capacity must be positive")

    override def zero: Buf = Map.empty

    override def reduce(b: Buf, x: String): Buf =
      b.get(x) match {
        case Some(e) => b.updated(x, e.copy(count = e.count + 1))
        case None if b.size < m => b.updated(x, Entry(1L, 0L))
        case None =>
          // evict the minimum-count entry; the newcomer inherits its
          // count as overestimation error (the Space-Saving step)
          val (minK, minE) = b.minBy { case (k, e) => (e.count, k) }
          (b - minK).updated(x, Entry(minE.count + 1, minE.count))
      }

    /** Merge of two summaries: counts add for shared keys (errors add
      * too), then the result truncates back to m by keeping the largest
      * estimates with a deterministic tie order — the mergeable-
      * summaries construction. Truncation only drops keys whose merged
      * estimate is among the smallest, so heavy terms survive. */
    override def merge(a: Buf, b: Buf): Buf = {
      val combined = (a.keySet ++ b.keySet).iterator.map { k =>
        val ae = a.getOrElse(k, Entry(0L, 0L))
        val be = b.getOrElse(k, Entry(0L, 0L))
        k -> Entry(ae.count + be.count, ae.err + be.err)
      }.toMap
      if (combined.size <= m) combined
      else combined.toSeq
        .sortBy { case (k, e) => (-e.count, k) } // deterministic tie order
        .take(m).toMap
    }

    override def finish(b: Buf): Map[String, Long] =
      b.map { case (k, e) => k -> e.count }

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
