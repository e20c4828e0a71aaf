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
}
