package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Time-window analytics over the stream-shaped `events` table —
  * batch-side oracles for the streaming operators (the same plans run
  * under Structured Streaming with watermarks; see StreamingAggSpec).
  * Tumbling/sliding windows and session windows; the streaming-only
  * concerns (watermark trimming, state eviction) are spec-tested since
  * SQL has no oracle for them. */
object EventQueries {
  import QuerySpec.MoneyAddend

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q33_window_tumbling",
      """Tumbling 1-hour windows per event_type: the canonical streaming
        |agg run batch-side. Map-side partial agg → one shuffle on
        |(window, type) regardless of input size.""".stripMargin,
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(MoneyAddend)).cast("double").as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value")),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
             | count(*) AS n_events,
             | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "q34_window_sliding",
      """Sliding windows (1 hour wide, 30 min slide): each event lands in
        |two windows. Spark explodes window instances before the agg; the
        |oracle mirrors with a two-bucket UNION ALL.""".stripMargin,
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n_events")),
      Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) ts, event_type FROM events),
             |w AS (
             |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type FROM e
             |  UNION ALL
             |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type FROM e)
             |SELECT window_start, event_type, count(*) AS n_events
             |FROM w GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "q35_session_window",
      """Session windows (30-min gap) per user: Spark's session_window
        |merges events while next.ts < prev.ts + gap; the oracle is the
        |classic gaps-and-islands (break on diff >= gap, cumulative-sum
        |session ids).""".stripMargin,
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("session_last"))
        .select(col("session_window.start").as("session_start"), col("user_id"),
          col("n_events"), col("session_last")),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events),
             |m AS (SELECT user_id, ts,
             |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
             |       THEN 1 ELSE 0 END brk FROM e),
             |s AS (SELECT user_id, ts,
             |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) sid FROM m)
             |SELECT min(ts) AS session_start, user_id, count(*) AS n_events, max(ts) AS session_last
             |FROM s GROUP BY user_id, sid""".stripMargin))
  )
}
