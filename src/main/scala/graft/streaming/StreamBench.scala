package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Streaming throughput sheet (README "Measured streaming throughput"):
  * drives the stateful streaming kernels at `args(0)` events
  * (default 1M) through MemoryStream → noop sink and prints ONE JSON
  * line with rows/s and state-store size, so the streaming surface has
  * recorded numbers beside its correctness specs.
  *
  * Run: `SPARK_GRAFT_CPUS=16 tools/run_verify.sh 1000000 /tmp/ignored graft.streaming.StreamBench`
  * (run_verify.sh passes its first argument through as the event count).
  *
  * Measured this way the number is the micro-batch ENGINE's sustained
  * throughput (source is in-memory, sink discards): real pipelines are
  * bounded by source/sink I/O before they're bounded by this. */
object StreamBench {

  private case class Res(rowsPerSec: Double, stateRows: Long, stateBytes: Long, batches: Int,
      provider: String)

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-streambench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = args.headOption.filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(1000000)
    val chunk = 100000

    // Each kernel pins its state-store provider for its own run and
    // restores the previous value afterward, so neither run order nor a
    // session-level providerClass override can leak into a kernel's
    // measurement (the join/dedup rows are published as HDFS-backed
    // numbers, so they pin that provider EXPLICITLY rather than trusting
    // the session default); the provider actually in force is captured
    // into the JSON row.
    def withStateProvider[T](providerClass: String)(f: => T): T = {
      val prev = spark.conf.getOption(ProviderKey)
      spark.conf.set(ProviderKey, providerClass)
      try f
      finally prev match {
        case Some(p) => spark.conf.set(ProviderKey, p)
        case None    => spark.conf.unset(ProviderKey)
      }
    }

    val HdfsProvider =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val RocksDbProvider =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

    def currentProvider(): String =
      spark.conf.getOption(ProviderKey).getOrElse(HdfsProvider).split('.').last

    // 1) bounded-state exact dedup: 2 events per key (50% duplicates),
    // with the duplicate ADJACENT to its original (key = i/2) so both
    // occurrences land well inside the 10-minute delay and the second
    // is actually suppressed — while event times sweep forward so the
    // watermark advances and evicts old keys (the two halves of the
    // operator's contract, both exercised)
    def runDedup(): Res = withStateProvider(HdfsProvider) {
      val stream = MemoryStream[(Long, Long)](spark)
      val deduped = StreamingDedup.dedupWithinWatermark(
        stream.toDF().select(col("_1").as("k"),
          timestamp_seconds(col("_2")).as("ts")),
        "ts", "10 minutes", Seq("k"))
      val q = deduped.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sbench-dedup").toString)
        .outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      (0 until n by chunk).foreach { off =>
        stream.addData((off until math.min(off + chunk, n)).map(i =>
          ((i / 2).toLong, (i / 100).toLong)))
      }
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val sops = q.recentProgress.flatMap(_.stateOperators)
      val emitted = q.recentProgress.map(_.sink.numOutputRows).filter(_ > 0).sum
      println(s"""{"metric":"stream_bench_dedup_emitted","rows":$emitted,"input":$n}""")
      val res = Res(n / secs,
        if (sops.isEmpty) 0L else sops.map(_.numRowsTotal).max,
        if (sops.isEmpty) 0L else sops.map(_.memoryUsedBytes).max,
        q.recentProgress.length, currentProvider())
      q.stop()
      res
    }

    // 2) transformWithState running count (typed ValueState; requires the
    // RocksDB provider, pinned for this kernel only)
    def runTws(): Res = withStateProvider(RocksDbProvider) {
      val stream = MemoryStream[(Long, Double)](spark)
      val counted = stream.toDS()
        .groupByKey(_._1)
        .transformWithState(new Processors.RunningCount(),
          TimeMode.None(), OutputMode.Update())
      val q = counted.toDF("k", "cnt").writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sbench-tws").toString)
        .outputMode(OutputMode.Update()).start()
      val t0 = System.nanoTime()
      (0 until n by chunk).foreach { off =>
        stream.addData((off until math.min(off + chunk, n)).map(i =>
          ((i % 100000).toLong, i.toDouble)))
      }
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val sops = q.recentProgress.flatMap(_.stateOperators)
      val res = Res(n / secs,
        if (sops.isEmpty) 0L else sops.map(_.numRowsTotal).max,
        if (sops.isEmpty) 0L else sops.map(_.memoryUsedBytes).max,
        q.recentProgress.length, currentProvider())
      q.stop()
      res
    }

    // 3) stream-stream inner join (the attribution shape of
    // StreamStreamJoinSpec at volume): n impressions ⋈ n clicks on key
    // + 10-minute event-time range, both watermarked so the join state
    // is evicted as event time sweeps forward; every impression matches
    // exactly one click 5s later, so emitted == n verifies the join did
    // its work rather than dropping everything. Throughput is reported
    // over the 2n INPUT events (both sides are state-store writes).
    def runJoin(): Res = withStateProvider(HdfsProvider) {
      val imps = MemoryStream[(Long, Long)](spark)
      val clicks = MemoryStream[(Long, Long)](spark)
      val joined = imps.toDF()
        .select(col("_1").as("k"), timestamp_seconds(col("_2")).as("imp_ts"))
        .withWatermark("imp_ts", "10 minutes")
        .join(
          clicks.toDF()
            .select(col("_1").as("ck"), timestamp_seconds(col("_2")).as("click_ts"))
            .withWatermark("click_ts", "10 minutes"),
          expr("k = ck AND click_ts >= imp_ts AND click_ts <= imp_ts + INTERVAL 10 MINUTES"))
      val q = joined.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sbench-join").toString)
        .outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      (0 until n by chunk).foreach { off =>
        val ids = off until math.min(off + chunk, n)
        imps.addData(ids.map(i => (i.toLong, (i / 100).toLong)))
        clicks.addData(ids.map(i => (i.toLong, (i / 100).toLong + 5L)))
      }
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val sops = q.recentProgress.flatMap(_.stateOperators)
      val emitted = q.recentProgress.map(_.sink.numOutputRows).filter(_ > 0).sum
      println(s"""{"metric":"stream_bench_join_emitted","rows":$emitted,"input":${2L * n}}""")
      val res = Res(2L * n / secs,
        if (sops.isEmpty) 0L else sops.map(_.numRowsTotal).max,
        if (sops.isEmpty) 0L else sops.map(_.memoryUsedBytes).max,
        q.recentProgress.length, currentProvider())
      q.stop()
      res
    }

    val dedup = runDedup()
    val tws = runTws()
    val join = runJoin()
    println(
      f"""{"metric":"stream_bench","events":$n,""" +
        f""""dedup_rows_per_sec":${dedup.rowsPerSec}%.0f,"dedup_state_rows":${dedup.stateRows},""" +
        f""""dedup_state_bytes":${dedup.stateBytes},"dedup_batches":${dedup.batches},""" +
        f""""dedup_state_provider":"${dedup.provider}",""" +
        f""""tws_rows_per_sec":${tws.rowsPerSec}%.0f,"tws_state_rows":${tws.stateRows},""" +
        f""""tws_state_bytes":${tws.stateBytes},"tws_batches":${tws.batches},""" +
        f""""tws_state_provider":"${tws.provider}",""" +
        f""""join_rows_per_sec":${join.rowsPerSec}%.0f,"join_state_rows":${join.stateRows},""" +
        f""""join_state_bytes":${join.stateBytes},"join_batches":${join.batches},""" +
        f""""join_state_provider":"${join.provider}"}""")
    spark.stop()
  }
}
