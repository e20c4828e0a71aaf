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
  *
  * Buffer representation (the hot path): a MUTABLE hash map — `reduce`
  * is called once per input row, so an immutable buffer would allocate
  * a fresh map per row. Eviction (find-min) uses count buckets — a
  * TreeMap from count to the TreeSet of keys at that count — giving
  * O(log m) eviction with the same deterministic (count, key) tie
  * order an O(m) scan had. The bucket index is rebuilt lazily after
  * (de)serialization: it is `@transient` (kryo skips transient
  * fields), so only the entries map ships between stages.
  */
object SpaceSaving {

  /** Summary entry: estimated count and maximum overestimation. */
  final case class Entry(count: Long, err: Long)

  /** Mutable ≤ m-entry Space-Saving summary. Not thread-safe (Spark
    * drives each Aggregator buffer from a single task thread). */
  final class Summary(val m: Int) extends Serializable {
    val entries = new java.util.HashMap[String, Entry]()

    /** count → keys with that count; rebuilt lazily after kryo
      * round-trips (kryo does not serialize transient fields). */
    @transient private var buckets: java.util.TreeMap[java.lang.Long, java.util.TreeSet[String]] = _

    private def ensureBuckets(): Unit = if (buckets == null) {
      buckets = new java.util.TreeMap[java.lang.Long, java.util.TreeSet[String]]()
      val it = entries.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); bucketAdd(e.getKey, e.getValue.count) }
    }

    private def bucketAdd(k: String, c: Long): Unit = {
      var s = buckets.get(c)
      if (s == null) { s = new java.util.TreeSet[String](); buckets.put(c, s) }
      s.add(k)
    }

    private def bucketRemove(k: String, c: Long): Unit = {
      val s = buckets.get(c)
      if (s != null) { s.remove(k); if (s.isEmpty) buckets.remove(c) }
    }

    /** One Space-Saving step: increment, insert, or evict-min. */
    def add(x: String): Unit = {
      val e = entries.get(x)
      if (e != null) {
        entries.put(x, Entry(e.count + 1, e.err))
        if (buckets != null) { bucketRemove(x, e.count); bucketAdd(x, e.count + 1) }
      } else if (entries.size < m) {
        entries.put(x, Entry(1L, 0L))
        if (buckets != null) bucketAdd(x, 1L)
      } else {
        // evict the (min count, min key) entry; the newcomer inherits
        // its count as overestimation error (the Space-Saving step)
        ensureBuckets()
        val minBucket = buckets.firstEntry()
        val minC = minBucket.getKey.longValue()
        val minK = minBucket.getValue.first()
        entries.remove(minK)
        bucketRemove(minK, minC)
        entries.put(x, Entry(minC + 1, minC))
        bucketAdd(x, minC + 1)
      }
    }

    /** Merge of two summaries: counts add for shared keys (errors add
      * too), then the result truncates back to m by keeping the largest
      * estimates with a deterministic (−count, key) tie order — the
      * mergeable-summaries construction. Truncation only drops keys
      * whose merged estimate is among the smallest, so heavy terms
      * survive. Merge is once-per-partition-pair, so the O(m log m)
      * sort is off the hot path. */
    def mergeWith(o: Summary): Summary = {
      val combined = new java.util.HashMap[String, Entry](entries)
      val it = o.entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val prev = combined.get(e.getKey)
        combined.put(e.getKey,
          if (prev == null) e.getValue
          else Entry(prev.count + e.getValue.count, prev.err + e.getValue.err))
      }
      val out = new Summary(m)
      if (combined.size <= m) out.entries.putAll(combined)
      else {
        val arr = new Array[(String, Entry)](combined.size)
        var i = 0
        val jt = combined.entrySet().iterator()
        while (jt.hasNext) { val e = jt.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
        scala.util.Sorting.stableSort(arr,
          (a: (String, Entry), b: (String, Entry)) =>
            a._2.count > b._2.count || (a._2.count == b._2.count && a._1 < b._1))
        var j = 0
        while (j < m) { out.entries.put(arr(j)._1, arr(j)._2); j += 1 }
      }
      out
    }

    def toCounts: Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      val it = entries.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.count) }
      b.result()
    }
  }

  /** Aggregator with capacity `m`: state is a ≤ m-entry summary. */
  final case class TopKAgg(m: Int) extends Aggregator[String, Summary, Map[String, Long]] {
    require(m > 0, "capacity must be positive")

    override def zero: Summary = new Summary(m)

    override def reduce(b: Summary, x: String): Summary = { b.add(x); b }

    override def merge(a: Summary, b: Summary): Summary = a.mergeWith(b)

    override def finish(b: Summary): Map[String, Long] = b.toCounts

    override def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
