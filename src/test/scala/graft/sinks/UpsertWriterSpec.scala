package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class UpsertWriterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("upsert").toString

  private def row(recordId: Int, routeId: Int, eventTime: Long, kph: Int = 0) =
    (recordId, routeId, eventTime, kph)

  private def frame(rows: (Int, Int, Long, Int)*) =
    rows.toDF("record_id", "routeId", "event_time", "kph")

  test("within-batch precombine keeps max event_time per key") {
    val out = tmpDir()
    UpsertWriter.upsert(frame(row(1, 7, 100, 10), row(1, 7, 200, 20), row(2, 7, 50)), out)
    val t = UpsertWriter.readTable(spark, out)
    assert(t.count() == 2)
    assert(t.filter($"record_id" === 1).head().getAs[Int]("kph") == 20)
  }

  test("cross-batch upsert: newer replaces, older is ignored (out-of-order)") {
    val out = tmpDir()
    UpsertWriter.upsert(frame(row(1, 7, 100, 10)), out)
    UpsertWriter.upsert(frame(row(1, 7, 300, 30)), out)   // newer wins
    UpsertWriter.upsert(frame(row(1, 7, 200, 20)), out)   // late, older: ignored
    val t = UpsertWriter.readTable(spark, out)
    assert(t.count() == 1)
    assert(t.head().getAs[Int]("kph") == 30)
  }

  test("replay is idempotent (duplicate delivery)") {
    val out = tmpDir()
    val batch = frame(row(1, 7, 100, 10), row(2, 8, 100, 5))
    UpsertWriter.upsert(batch, out)
    UpsertWriter.upsert(batch, out)
    val t = UpsertWriter.readTable(spark, out)
    assert(t.count() == 2)
  }

  test("equal precombine: incoming batch wins the tie") {
    val out = tmpDir()
    UpsertWriter.upsert(frame(row(1, 7, 100, 10)), out)
    UpsertWriter.upsert(frame(row(1, 7, 100, 99)), out)
    assert(UpsertWriter.readTable(spark, out).head().getAs[Int]("kph") == 99)
  }

  test("output is partitioned by routeId and untouched partitions survive") {
    val out = tmpDir()
    UpsertWriter.upsert(frame(row(1, 7, 100), row(2, 8, 100)), out)
    // second batch touches only routeId=7
    UpsertWriter.upsert(frame(row(3, 7, 100)), out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("routeId="))
    assert(dirs.toSet == Set("routeId=7", "routeId=8"))
    val t = UpsertWriter.readTable(spark, out)
    assert(t.count() == 3)
    assert(t.filter($"routeId" === 8).count() == 1)
  }

  test("unique keys with max event_time — the §7.4 invariant on generated data") {
    val out = tmpDir()
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)(row(rnd.nextInt(50), rnd.nextInt(5), rnd.nextInt(1000).toLong, rnd.nextInt(100)))
    rows.grouped(100).foreach(b => UpsertWriter.upsert(frame(b: _*), out))
    val t = UpsertWriter.readTable(spark, out)
    val keys = t.select("record_id").distinct().count()
    assert(t.count() == keys, "keys must be unique after upsert")
    // each key's event_time is the max seen for that key
    val expected = frame(rows: _*).groupBy("record_id").agg(max("event_time").as("m"))
    val bad = t.join(expected, "record_id").filter($"event_time" =!= $"m").count()
    assert(bad == 0)
  }
}
