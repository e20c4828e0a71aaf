package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.TestSpark

/** Remaining streaming operator coverage: streaming dedup with
  * watermarked state expiry, stream-stream interval join,
  * flatMapGroupsWithState, and `df.observe` metrics (O1). */
class StreamingOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming dropDuplicates with watermark dedups within the state horizon") {
    val stream = MemoryStream[Ev](spark)
    val dedup = stream.toDF()
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("user_id", "event_type")
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    stream.addData(Ev(ts(0), 1, "click", 1), Ev(ts(1), 1, "click", 2), Ev(ts(2), 2, "view", 3))
    q.processAllAvailable()
    stream.addData(Ev(ts(3), 1, "click", 4)) // still duplicate within horizon
    q.processAllAvailable()
    val n = spark.table("sdedup").count()
    q.stop()
    assert(n == 2) // (1,click) once + (2,view)
  }

  test("stream-stream interval join: impressions x clicks within 10 minutes") {
    val imps = MemoryStream[Ev](spark)
    val clicks = MemoryStream[Ev](spark)
    val i = imps.toDF().select(col("user_id").as("i_user"), col("ts").as("i_ts"))
      .withWatermark("i_ts", "1 hour")
    val c = clicks.toDF().select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val joined = i.join(c,
      expr("i_user = c_user AND c_ts BETWEEN i_ts AND i_ts + interval 10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    imps.addData(Ev(ts(0), 1, "imp", 0), Ev(ts(0), 2, "imp", 0))
    clicks.addData(Ev(ts(5), 1, "click", 0),  // within window -> joins
      Ev(ts(30), 2, "click", 0))              // outside 10m   -> dropped
    q.processAllAvailable()
    val rows = spark.table("ssjoin").collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("i_user") == 1L)
  }

  test("flatMapGroupsWithState: emit a record per completed threshold crossing") {
    val stream = MemoryStream[Ev](spark)
    // emit (user, runningTotal) only when the cumulative value crosses
    // multiples of 10 — classic custom-state alerting shape
    val alerts = stream.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Double]) =>
          var total = state.getOption.getOrElse(0.0)
          val out = scala.collection.mutable.Buffer[(Long, Double)]()
          evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val before = (total / 10).toInt
            total += e.value
            if ((total / 10).toInt > before) out += ((user, total))
          }
          state.update(total)
          out.iterator
      }
    val q = alerts.toDF("user_id", "total").writeStream
      .format("memory").queryName("alerts").outputMode(OutputMode.Append()).start()
    stream.addData(Ev(ts(0), 1, "a", 4), Ev(ts(1), 1, "a", 4))   // 8: no alert
    q.processAllAvailable()
    stream.addData(Ev(ts(2), 1, "a", 4))                         // 12: crosses 10
    q.processAllAvailable()
    val rows = spark.table("alerts").collect().map(r => (r.getLong(0), r.getDouble(1)))
    q.stop()
    assert(rows.toSeq == Seq((1L, 12.0)))
  }

  test("file-source streaming over driver events parquet matches the batch window agg") {
    graft.GraftSession.ensureConfs(spark)
    // the file source needs a directory: stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    // raw read schema drifts across testdata generations (epoch-nanos
    // long vs timestamp[us]); normalizeEventTs handles every shape
    val raw = spark.read.parquet(s"$sf001/events.parquet")
    val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(raw.schema).parquet(dir.toString))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("filestream")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("filestream")
      .select(col("window.start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.sources.Tables.events(spark, sf001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("df.observe metrics surface through the streaming progress (O1)") {
    val rec = Observability.attach(spark)
    try {
      val stream = MemoryStream[Ev](spark)
      // data must land BEFORE start: AvailableNow plans its batches
      // from what is available at query start, so a post-start addData
      // can race the trigger into terminating on zero batches — and an
      // all-empty run reports no observed metrics at all
      stream.addData(Ev(ts(0), 1, "a", 2.5), Ev(ts(1), 2, "b", 7.5))
      val observed = stream.toDF().observe("in_metrics",
        count(lit(1)).as("rows"), sum("value").as("value_sum"))
      val q = observed.writeStream.format("memory").queryName("obs")
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // generous bound: listener-bus delivery can lag far behind
      // processAllAvailable under box contention (observed >10s); the
      // loop exits as soon as the event lands, so idle runs pay nothing
      val deadline = System.currentTimeMillis() + 60000
      var metrics: Option[org.apache.spark.sql.Row] = None
      while (metrics.isEmpty && System.currentTimeMillis() < deadline) {
        metrics = rec.progress.toArray(Array.empty[org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent])
          .flatMap(e => Option(e.progress.observedMetrics.get("in_metrics"))).headOption
        if (metrics.isEmpty) Thread.sleep(100)
      }
      assert(metrics.isDefined, "observed metrics not reported")
      assert(metrics.get.getAs[Long]("rows") == 2L)
      assert(metrics.get.getAs[Double]("value_sum") == 10.0)
    } finally spark.streams.removeListener(rec)
  }
}
