package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode, TimeMode, Trigger}
import graft.TestSpark

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Streaming analytics parity (SURVEY §2.2 streaming rows): the same
  * window plans the batch queries oracle-check (q33-q35) run here under
  * Structured Streaming with watermarks; plus a custom
  * mapGroupsWithState stateful operator. */
class StreamingAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("tumbling windowed agg with watermark matches the batch plan") {
    val events = Seq(
      Ev(ts(5), 1, "click", 1.0), Ev(ts(20), 1, "click", 2.0),
      Ev(ts(65), 2, "view", 3.0), Ev(ts(70), 1, "click", 4.0))

    val stream = MemoryStream[Ev](spark)
    stream.addData(events: _*)
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("tumbling")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("s"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = events.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .select(col("window.start"), col("event_type"), col("n"), col("s"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("watermark in append mode drops state for closed windows and emits finals only") {
    val stream = MemoryStream[Ev](spark)
    val agg = stream.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("appendw")
      .outputMode(OutputMode.Append()).start()

    stream.addData(Ev(ts(1), 1, "a", 1), Ev(ts(8), 1, "a", 1))
    q.processAllAvailable()
    // advance watermark far past the first window
    stream.addData(Ev(ts(60), 1, "a", 1))
    q.processAllAvailable()
    val rows = spark.table("appendw").collect()
    q.stop()
    // first two windows ([00:00,00:10)) finalized with n=2
    assert(rows.exists(r => r.getStruct(0).getTimestamp(0) == ts(0) && r.getLong(1) == 2))
    // the open 01:00 window must NOT be emitted in append mode
    assert(!rows.exists(r => r.getStruct(0).getTimestamp(0) == ts(60)))
  }

  test("session_window streaming groups events by 30-minute gaps") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(
      Ev(ts(0), 1, "a", 1), Ev(ts(10), 1, "a", 1),   // session 1 (gap < 30m)
      Ev(ts(50), 1, "a", 1),                          // session 2
      Ev(ts(0), 2, "b", 1))
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sessions")
      .select(col("session_window.start"), col("user_id"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((ts(0), 1L, 2L), (ts(50), 1L, 1L), (ts(0), 2L, 1L)))
  }

  test("streaming dedup within watermark suppresses dups and evicts state after the delay") {
    val stream = MemoryStream[Ev](spark)
    val deduped = StreamingDedup.dedupWithinWatermark(
      stream.toDF(), "ts", "10 minutes", Seq("user_id", "event_type"))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()

    // batch 1: a duplicate pair within the delay → one survivor
    stream.addData(Ev(ts(0), 1, "click", 1.0), Ev(ts(2), 1, "click", 2.0), Ev(ts(1), 2, "view", 3.0))
    q.processAllAvailable()
    // batch 2: same key again, still within the watermark → suppressed
    stream.addData(Ev(ts(4), 1, "click", 4.0))
    q.processAllAvailable()
    assert(spark.table("sdedup").filter(col("user_id") === 1).count() == 1)
    // batch 3: advance the watermark far past the key's eviction point,
    // then re-send the key → state was dropped, the key emits again
    stream.addData(Ev(ts(120), 9, "warm", 0.0))
    q.processAllAvailable()
    stream.addData(Ev(ts(125), 1, "click", 5.0))
    q.processAllAvailable()
    val user1 = spark.table("sdedup").filter(col("user_id") === 1).collect()
    q.stop()
    assert(user1.length == 2, "key must re-emit after state eviction (bounded state, not lifetime dedup)")
  }

  test("transformWithState: typed ValueState running count per key (RocksDB store)") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(Long, Double)](spark)
      val counted = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(new Processors.RunningCount(),
          TimeMode.None(), OutputMode.Update())
      val q = counted.toDF("user_id", "n").writeStream
        .format("memory").queryName("twscount").outputMode(OutputMode.Update()).start()
      stream.addData((1L, 1.0), (1L, 2.0), (2L, 3.0))
      q.processAllAvailable()
      stream.addData((1L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("twscount").collect().map(r => (r.getLong(0), r.getLong(1)))
      q.stop()
      // batch 1 emits (1,2),(2,1); batch 2 emits (1,3) — state carried
      assert(rows.toSet == Set((1L, 2L), (2L, 1L), (1L, 3L)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("mapGroupsWithState: custom running-max state per key across micro-batches") {
    val stream = MemoryStream[Ev](spark)
    val result = stream.toDS()
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Double]) =>
          val mx = (evs.map(_.value) ++ state.getOption.iterator).max
          state.update(mx)
          (user, mx)
      }
    val q = result.toDF("user_id", "max_value").writeStream
      .format("memory").queryName("runmax").outputMode(OutputMode.Update()).start()

    stream.addData(Ev(ts(0), 1, "a", 5.0), Ev(ts(1), 1, "a", 3.0))
    q.processAllAvailable()
    stream.addData(Ev(ts(2), 1, "a", 4.0))   // below running max: state holds 5
    q.processAllAvailable()
    stream.addData(Ev(ts(3), 1, "a", 9.0))
    q.processAllAvailable()
    val hist = spark.table("runmax").collect().map(r => (r.getLong(0), r.getDouble(1)))
    q.stop()
    assert(hist.toSeq.count(_._1 == 1L) == 3)
    assert(hist.last == (1L, 9.0))
    assert(hist.toSeq.map(_._2) == Seq(5.0, 5.0, 9.0))
  }
}
