package graft.sinks

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** S5 JDBC sink integration — a REAL database round-trip, not a config
  * shim test: Spark's JDBC writer against embedded Derby (shipped in
  * `/opt/spark/jars` for the Hive metastore, so it is available in
  * every CI image this engine targets), in-memory so nothing touches
  * disk. Covers the reference `PutSQL` semantics (`nifi-project.xml:
  * 1116`): batched INSERTs (batch size 100), append-only accumulation
  * across micro-batch-like repeated writes, and the pool-size
  * analogue (`numPartitions`); plus overwrite for completeness. */
class JdbcWriterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  System.setProperty("derby.system.home",
    System.getProperty("java.io.tmpdir") + "/graft-derby")

  private def readBack(table: String) =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()

  test("append round-trips rows and accumulates across repeated writes") {
    val rows = (1L to 250L).map(i => (i, s"route_${i % 7}", i * 2.5)).toDF(
      "record_id", "route_id", "speed")
    // batchSize 100 over 250 rows exercises full + partial batches per
    // partition; maxConnections 4 = four writer partitions.
    JdbcWriter.write(rows, url, "bus_status", "app", "secret",
      batchSize = 100, maxConnections = 4)
    val got = readBack("bus_status")
    assert(got.count() == 250)
    assert(got.columns.map(_.toLowerCase).sorted.sameElements(
      Array("record_id", "route_id", "speed")))
    assert(got.agg(org.apache.spark.sql.functions.sum("record_id"))
      .first().getLong(0) == (1L to 250L).sum)

    // second micro-batch appends, never replaces (the PutSQL contract)
    JdbcWriter.write(rows.limit(50), url, "bus_status", "app", "secret")
    assert(readBack("bus_status").count() == 300)
  }

  test("overwrite replaces table contents") {
    val first = Seq((1L, "a"), (2L, "b")).toDF("record_id", "route_id")
    JdbcWriter.write(first, url, "overwrite_t", "app", "secret")
    val second = Seq((9L, "z")).toDF("record_id", "route_id")
    JdbcWriter.write(second, url, "overwrite_t", "app", "secret",
      mode = SaveMode.Overwrite)
    val got = readBack("overwrite_t").collect()
    assert(got.length == 1 && got.head.getLong(0) == 9L)
  }

  test("reference topology end-to-end: envelope stream -> parse -> JDBC table") {
    // The NiFi path (S4 JSON->SQL + S5 PutSQL) as the engine runs it:
    // a checkpointed micro-batch stream of Debezium envelopes, the
    // P1-P4 transform, and a foreachBatch JDBC append into a REAL
    // database — two drains prove the checkpoint makes the appends
    // incremental (no batch replayed, no rows doubled).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.{EnvelopeParser, Envelopes}
    val stream = MemoryStream[String](spark)
    val cp = java.nio.file.Files.createTempDirectory("jdbc_cp").toString
    def drain(): Unit = {
      val q = EnvelopeParser.transform(stream.toDF())
        .writeStream
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          JdbcWriter.write(batch, url, "bus_stream", "app", "secret")
        }
        .start()
      q.awaitTermination()
    }
    stream.addData(
      Envelopes.envelope(Envelopes.busJson(recordId = 1, kph = 10)),
      Envelopes.envelope(Envelopes.busJson(recordId = 2, kph = 20)))
    drain()
    assert(readBack("bus_stream").count() == 2)

    stream.addData(Envelopes.envelope(Envelopes.busJson(recordId = 3, kph = 30)))
    drain()
    val got = readBack("bus_stream")
    assert(got.count() == 3, "second drain must append ONLY the new micro-batch")
    assert(got.select("record_id").collect().map(_.getInt(0)).sorted
      .sameElements(Array(1, 2, 3)))
  }
}
