package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asof semantics: latest right at-or-before, equal-time inclusive, null before first") {
    val left = Seq(
      (1L, ts(5), "e1"),   // between r@2 and r@10 → r@2
      (1L, ts(10), "e2"),  // equal time → r@10 (>= convention)
      (1L, ts(1), "e3"),   // before first right → null
      (2L, ts(30), "e4"),  // key with no rights → null
      (1L, ts(59), "e5"))  // after last right → r@10
      .toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts(2), 100L),
      (1L, ts(10), 200L))
      .toDF("k", "rt", "price")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("price", "rt"))
      .collect().map(r => r.getAs[String]("ev") ->
        (Option(r.getAs[Any]("price")), Option(r.getAs[Any]("rt")))).toMap
    assert(out("e1") == (Some(100L), Some(ts(2))))
    assert(out("e2") == (Some(200L), Some(ts(10))))
    assert(out("e3") == (None, None))
    assert(out("e4") == (None, None))
    assert(out("e5") == (Some(200L), Some(ts(10))))
  }

  test("a matched right row's genuine NULL is carried, not skipped back to an older row") {
    val left = Seq((1L, ts(12), "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts(2), Some(5L)),
      (1L, ts(10), None))   // the as-of match — its NULL price must win
      .toDF("k", "rt", "price")
    val r = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("price", "rt")).head()
    assert(r.isNullAt(r.fieldIndex("price")), "price must be the matched row's NULL, not 5")
    assert(r.getAs[Timestamp]("rt") == ts(10), "rt must come from the SAME matched row")
  }

  test("NULL keys never match (equi-join semantics)") {
    val left = Seq(
      (Option.empty[Long], ts(5), "lnull"),
      (Some(1L), ts(5), "l1"))
      .toDF("k", "t", "ev")
    val right = Seq(
      (Option.empty[Long], ts(2), 70L),
      (Some(1L), ts(2), 100L))
      .toDF("k", "rt", "price")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("price"))
      .collect().map(r => r.getAs[String]("ev") -> Option(r.getAs[Any]("price"))).toMap
    assert(out("lnull").isEmpty, "NULL-key left row must stay unmatched")
    assert(out("l1").contains(100L))
  }

  test("row count is exactly |left| (no fan-out, no drops)") {
    val left = (1 to 100).map(i => (i.toLong % 5, ts(i % 60), i.toLong)).toDF("k", "t", "id")
    val right = (1 to 20).map(i => (i.toLong % 5, ts(i % 60), i * 10L)).toDF("k", "rt", "v")
    // dedup right per (key, time) per the operator's determinism contract
    val r1 = right.groupBy("k", "rt").agg(org.apache.spark.sql.functions.max("v").as("v"))
    val out = AsofJoin.asofJoin(left, r1, "k", "t", "rt", Seq("v"))
    assert(out.count() == 100)
    assert(out.columns.toSet == Set("k", "t", "id", "v"))
  }
}
