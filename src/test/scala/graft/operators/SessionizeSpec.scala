package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

class SessionizeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  test("gap rule: ordinals increment exactly when the gap is exceeded") {
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(10)),   // session 1 (gap 10m < 30m)
      (1L, 3L, ts(50)),                     // session 2 (gap 40m)
      (1L, 4L, ts(55)),                     // still session 2
      (1L, 5L, ts(85)),                     // gap EXACTLY 30m → new session
      (2L, 9L, ts(0)))                      // other key: own numbering
      .toDF("user_id", "event_id", "t")
    val out = Sessionize.assignSessions(df, "user_id", "t", "event_id", 1800L)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L, 9L -> 1L))
  }

  test("session count per user agrees with session_window aggregation on driver events") {
    val ev = Tables.events(spark, sf001).select("event_id", "user_id", "ts")
    val viaRows = Sessionize.assignSessions(ev, "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id").agg(max("session_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaWindow = Tables.events(spark, sf001)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaRows == viaWindow,
      "row-level session ordinals must partition events identically to session_window")
  }
}
