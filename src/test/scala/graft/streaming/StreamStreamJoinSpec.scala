package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark

case class Impression(imp_ts: Timestamp, ad_id: Long, campaign: String)
case class Click(click_ts: Timestamp, ad_id: Long, click_id: Long)

/** Stream-stream joins (SURVEY §2.2 streaming rows): two unbounded
  * inputs joined on key + event-time range, both watermarked so the
  * join state is bounded — the attribution-join shape (impressions ⋈
  * clicks within an attribution window). Spark buffers both sides in
  * state and evicts rows once the watermark passes the range bound;
  * without the time-range condition the state would grow without
  * bound, which Spark rejects in append mode for outer variants. */
class StreamStreamJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("watermarked inner join on key + time range matches the batch join and drops out-of-window clicks") {
    val imps = MemoryStream[Impression](spark)
    val clicks = MemoryStream[Click](spark)

    val joined = imps.toDF().withWatermark("imp_ts", "10 minutes")
      .join(
        clicks.toDF().withColumnRenamed("ad_id", "c_ad_id")
          .withWatermark("click_ts", "10 minutes"),
        expr("""ad_id = c_ad_id
               |AND click_ts >= imp_ts
               |AND click_ts <= imp_ts + INTERVAL 10 MINUTES""".stripMargin),
        "inner")

    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        Impression(ts(0), 1L, "spring"),
        Impression(ts(0), 2L, "summer"),
        Impression(ts(30), 1L, "spring_late"))
      clicks.addData(
        Click(ts(5), 1L, 100L),   // within window of imp@0  -> match
        Click(ts(25), 1L, 101L),  // 25m after imp@0, before imp@30 -> no match
        Click(ts(32), 1L, 102L),  // within window of imp@30 -> match
        Click(ts(9), 3L, 103L))   // no impression for ad 3  -> no match
      q.processAllAvailable()
      // advance both watermarks so all joinable rows are final
      imps.addData(Impression(ts(120), 9L, "flush"))
      clicks.addData(Click(ts(120), 9L, 999L))
      q.processAllAvailable()

      val got = spark.table("attrib")
        .select(col("campaign"), col("click_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == Set(("spring", 100L), ("spring_late", 102L), ("flush", 999L)))

      // the streaming result must equal the equivalent batch join
      val impsB = Seq(
        Impression(ts(0), 1L, "spring"), Impression(ts(0), 2L, "summer"),
        Impression(ts(30), 1L, "spring_late"), Impression(ts(120), 9L, "flush")).toDF()
      val clicksB = Seq(
        Click(ts(5), 1L, 100L), Click(ts(25), 1L, 101L), Click(ts(32), 1L, 102L),
        Click(ts(9), 3L, 103L), Click(ts(120), 9L, 999L)).toDF()
      val batch = impsB.join(clicksB.withColumnRenamed("ad_id", "c_ad_id"),
        expr("ad_id = c_ad_id AND click_ts >= imp_ts AND click_ts <= imp_ts + INTERVAL 10 MINUTES"),
        "inner")
        .select(col("campaign"), col("click_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == batch)

      // bounded state: after the watermark passed them, the early rows
      // must be evicted from the join state store. The eviction runs in
      // a no-data cleanup batch whose progress may land AFTER
      // processAllAvailable returns, so poll briefly instead of reading
      // lastProgress once (only rows near the 120m flush may remain;
      // the 9 rows from minutes 0-32 are older than watermark - range)
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      var stateRows = Long.MaxValue
      while (stateRows > 4 && System.nanoTime < deadline) {
        q.processAllAvailable()
        val seen = q.recentProgress
          .filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.map(_.numRowsTotal).sum)
        if (seen.nonEmpty) stateRows = seen.min
        if (stateRows > 4) Thread.sleep(250)
      }
      assert(stateRows <= 4,
        s"join state must evict watermark-expired rows, still holds $stateRows")
    } finally q.stop()
  }
}
