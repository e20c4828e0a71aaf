package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Funnel.firstTouch]] semantics pinned on a hand fixture: first
  * touch only (re-entries never reopen), strictly-after ordering, the
  * conversion window, monotone step reachability, and null-timestamp
  * drops. q85 oracles the arithmetic on driver data; this spec proves
  * the decisions. */
class FunnelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 + min

  test("first-touch, strictly-after, windowed semantics on a hand fixture") {
    val events = Seq(
      // user 1: clean full conversion a(0) -> b(10) -> c(20)
      (1L, ts(0), "a"), (1L, ts(10), "b"), (1L, ts(20), "c"),
      // user 2: b BEFORE its first a never counts; the later b does
      (2L, ts(5), "b"), (2L, ts(8), "a"), (2L, ts(30), "b"),
      // user 3: b outside the 60-min window from a -> funnel stops at a
      (3L, ts(0), "a"), (3L, ts(90), "b"), (3L, ts(95), "c"),
      // user 4: first touch pins t_a at 0 even though a recurs at 40;
      // b at 70 is outside the window FROM THE FIRST a -> stops at a
      (4L, ts(0), "a"), (4L, ts(40), "a"), (4L, ts(70), "b"),
      // user 5: never enters (no a) -> absent from the output
      (5L, ts(0), "b"), (5L, ts(1), "c"),
      // user 6: c before b reaches only a..b; c strictly-after rule
      (6L, ts(0), "a"), (6L, ts(10), "c"), (6L, ts(20), "b")
    ).toDF("user_id", "ts", "event_type")

    val out = Funnel.firstTouch(events, "user_id", "ts", "event_type",
        steps = Seq("a", "b", "c"), windowSeconds = 3600L)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("steps"), Option(r.getAs[Timestamp]("t_b")),
          Option(r.getAs[Timestamp]("t_c")), r.getAs[Long]("conversion_us")))).toMap

    assert(out.keySet == Set(1L, 2L, 3L, 4L, 6L), "only entrants appear")
    assert(out(1L) == ((3L, Some(ts(10)), Some(ts(20)), 20L * 60000000L)))
    assert(out(2L)._1 == 2L, "pre-entry b must not count; post-entry b does")
    assert(out(2L)._2.contains(ts(30)))
    assert(out(3L) == ((1L, None, None, -1L)), "window violation stops the funnel")
    assert(out(4L) == ((1L, None, None, -1L)), "first touch pins the window origin")
    assert(out(6L)._1 == 2L, "c before b cannot complete the funnel")
    // user 6's c at minute 10 precedes t_b=20 -> no c within window AFTER b?
    // (no later c exists) -> t_c is None
    assert(out(6L)._3.isEmpty)
  }

  test("null timestamps are dropped, not ordered") {
    val events = Seq(
      (1L, Option(ts(0)), "a"), (1L, Option.empty[Timestamp], "b"), (1L, Option(ts(9)), "b")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.firstTouch(events, "user_id", "ts", "event_type",
      Seq("a", "b"), windowSeconds = 3600L).collect()
    assert(out.length == 1 && out.head.getAs[Long]("steps") == 2L)
    assert(out.head.getAs[Timestamp]("t_b") == ts(9))
  }

  test("invalid parameters rejected eagerly") {
    val df = Seq((1L, ts(0), "a")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException](
      Funnel.firstTouch(df, "user_id", "ts", "event_type", Seq("a"), 60L))
    intercept[IllegalArgumentException](
      Funnel.firstTouch(df, "user_id", "ts", "event_type", Seq("a", "a"), 60L))
    intercept[IllegalArgumentException](
      Funnel.firstTouch(df, "user_id", "ts", "event_type", Seq("a", "b"), 0L))
  }
}
