package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(sec: Int) = Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")

  test("range pairs: in-window kept (incl. exact boundary), out-of-window and cross-key dropped") {
    val df = Seq(
      (1L, 10L, ts(0)),    // pairs with 11 (gap 30) and 12 (gap 60 — inclusive boundary)
      (1L, 11L, ts(30)),   // pairs with 12 (gap 30)
      (1L, 12L, ts(60)),   // gap to 13 is 61s > 60 → no pair
      (1L, 13L, ts(121)),
      (2L, 20L, ts(15)))   // other key: never pairs with key 1
      .toDF("k", "id", "t")
    val pairs = RangeJoin.timeWindowPairs(df, "k", "t", "id", maxGapSeconds = 60L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs == Set((10L, 11L), (10L, 12L), (11L, 12L)), s"got $pairs")
  }

  test("equal timestamps pair once, ordered by id") {
    val df = Seq((1L, 5L, ts(10)), (1L, 6L, ts(10))).toDF("k", "id", "t")
    val pairs = RangeJoin.timeWindowPairs(df, "k", "t", "id", 60L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("gap_us")))
    assert(pairs.toSeq == Seq((5L, 6L, 0L)))
  }

  test("pairs spanning a bucket boundary are found exactly once") {
    // gap 60s → bucket width 60s; t=59 and t=61 are in adjacent buckets
    val df = Seq((1L, 1L, ts(59)), (1L, 2L, ts(61))).toDF("k", "id", "t")
    val rows = RangeJoin.timeWindowPairs(df, "k", "t", "id", 60L).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("gap_us") == 2000000L)
  }
}
