package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.pipeline.Envelopes
import graft.sinks.UpsertWriter

/** End-to-end streaming tests (SURVEY §5.2): MemoryStream of Debezium
  * envelopes → transform → checkpointed foreachBatch upsert → table
  * state asserted across multiple micro-batches (replay, out-of-order,
  * key collisions). */
class BusPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def drain(stream: MemoryStream[String], table: String, cp: String): Unit = {
    val q = BusPipeline.run(stream.toDF(), table, cp)
    q.awaitTermination()   // AvailableNow: drains then stops
  }

  test("insert then update across micro-batches: latest image wins") {
    val stream = MemoryStream[String](spark)
    val (table, cp) = (tmp("bus_table"), tmp("bus_cp"))

    stream.addData(Envelopes.insert)
    drain(stream, table, cp)
    val after1 = UpsertWriter.readTable(spark, table)
    assert(after1.count() == 1)
    assert(after1.head().getAs[Int]("kph") == 0)

    stream.addData(Envelopes.update)  // same record_id, newer event_time, kph=25
    drain(stream, table, cp)
    val after2 = UpsertWriter.readTable(spark, table)
    assert(after2.count() == 1)
    assert(after2.head().getAs[Int]("kph") == 25)
  }

  test("out-of-order, duplicates, deletes and malformed records in one stream") {
    val stream = MemoryStream[String](spark)
    val (table, cp) = (tmp("bus_table2"), tmp("bus_cp2"))

    stream.addData(
      Envelopes.envelope(Envelopes.busJson(recordId = 1, eventTime = 2000, kph = 2)),
      Envelopes.envelope(Envelopes.busJson(recordId = 1, eventTime = 1000, kph = 1)), // older
      Envelopes.envelope(Envelopes.busJson(recordId = 1, eventTime = 2000, kph = 2)), // dup
      Envelopes.envelope(Envelopes.busJson(recordId = 2, routeId = 9, eventTime = 500)),
      Envelopes.delete,
      Envelopes.malformed)
    drain(stream, table, cp)

    val t = UpsertWriter.readTable(spark, table)
    assert(t.count() == 2)
    assert(t.filter($"record_id" === 1).head().getAs[Int]("kph") == 2)
    assert(t.filter($"record_id" === 2).head().getAs[Int]("routeId") == 9)
  }

  test("observability: listener records progress with input rows") {
    val rec = Observability.attach(spark)
    try {
      val stream = MemoryStream[String](spark)
      stream.addData(Envelopes.insert, Envelopes.update)
      drain(stream, tmp("bus_table3"), tmp("bus_cp3"))
      // listener events are async and can lag far behind the batch
      // under box contention; the loop exits as soon as they land
      val deadline = System.currentTimeMillis() + 60000
      while (rec.totalInputRows < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(rec.totalInputRows >= 2)
    } finally spark.streams.removeListener(rec)
  }

  test("streaming partitioned append sink (K3 parity)") {
    val stream = MemoryStream[String](spark)
    val (table, cp) = (tmp("append_table"), tmp("append_cp"))
    stream.addData(
      Envelopes.envelope(Envelopes.busJson(recordId = 1, routeId = 7)),
      Envelopes.envelope(Envelopes.busJson(recordId = 2, routeId = 8)))
    val q = graft.sinks.AppendWriter
      .appendStream(BusPipeline.transform(stream.toDF()), table, cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val t = spark.read.parquet(table)
    assert(t.count() == 2)
    val dirs = new java.io.File(table).listFiles().map(_.getName).filter(_.startsWith("routeId="))
    assert(dirs.toSet == Set("routeId=7", "routeId=8"))
  }
}
