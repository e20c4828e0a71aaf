package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-touch funnel construction over an event log — the
  * product-analytics staple generalized to ANY ordered step sequence:
  * for each key that enters at `steps.head`, the earliest occurrence
  * of every subsequent step STRICTLY AFTER the previous step's first
  * touch and within `windowSeconds` of it (the conversion window).
  *
  * Semantics are first-touch throughout: later re-entries never reopen
  * an earlier step (the deterministic convention — re-entry funnels
  * need per-attempt sessionization, which is [[Sessionize]]'s job).
  * Rows with a NULL timestamp are dropped (no defined position in a
  * time-ordered funnel — the q52/q62 convention).
  *
  * Scale shape: one min-aggregation and one join per step, ALL keyed
  * on the funnel key, so every exchange hash-partitions on the same
  * key and the plan reuses that partitioning; the funnel frontier
  * shrinks monotonically step over step, so AQE broadcasts it into
  * each subsequent event scan. The sequential dependency between
  * steps is inherent to strictly-ordered funnel semantics. q85 is
  * this operator at (view, click, purchase) × 24 h.
  */
object Funnel {

  /** Returns one row per key reaching `steps.head`:
    * (key, t_<step>... , steps, conversion_us) where `steps` counts
    * reached stages and `conversion_us` is the exact first-to-last
    * latency in epoch microseconds (−1 until full conversion). Step
    * names become `t_<name>` columns, so they must be column-safe. */
  def firstTouch(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got $steps")
    require(steps.distinct.size == steps.size, s"funnel steps must be distinct: $steps")
    require(windowSeconds > 0, s"conversion window must be positive, got $windowSeconds")
    val ev = events.filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(typeCol))
    def tc(s: String) = s"t_$s"
    val entry = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(tc(steps.head)))
    val stepFrames = steps.sliding(2).foldLeft(List(entry)) {
      case (acc, Seq(prev, cur)) =>
        val f = ev.filter(col(typeCol) === cur)
          .join(acc.head.select(col(keyCol), col(tc(prev))), keyCol)
          .filter(col(tsCol) > col(tc(prev)) &&
            col(tsCol) <= col(tc(prev)) + expr(s"INTERVAL $windowSeconds SECONDS"))
          .groupBy(col(keyCol)).agg(min(col(tsCol)).as(tc(cur)))
        f :: acc
      case (acc, _) => acc
    }.reverse
    val joined = stepFrames.tail.foldLeft(stepFrames.head) { (l, r) =>
      l.join(r, Seq(keyCol), "left")
    }
    val reached = steps.tail
      .map(s => when(col(tc(s)).isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    joined.select(
      col(keyCol) +: steps.map(s => col(tc(s))) :+
        reached.as("steps") :+
        coalesce(
          unix_micros(col(tc(steps.last))) - unix_micros(col(tc(steps.head))),
          lit(-1L)).as("conversion_us"): _*)
  }
}
