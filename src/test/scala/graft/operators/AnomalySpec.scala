package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Anomaly.dailySpikes]] decisions pinned on a hand fixture: the
  * baseline gate (no flag, ratio −1 until `baselineDays` observed
  * days), the planted-spike fire, quiet-day silence, the exact
  * quantized ratio, gap handling (ROWS frame skips silent days rather
  * than zero-filling), and null-timestamp drops. q90 oracles the
  * arithmetic on driver data — where uniform synthetic volumes never
  * spike, so the flag's fire path lives here. */
class AnomalySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(day: Int, i: Int) =
    new Timestamp(1704067200000L + day * 86400000L + i * 1000L) // 2024-01-01 + d

  test("baseline gate, planted spike, exact ratio, gaps, null drops") {
    // series "s": days 0..6 at 10 events/day, day 7 spikes to 40,
    // day 8 back to 10. series "t": only 3 days — never earns a
    // baseline. A null-ts row and a day-9 gap (silent day) included.
    val rows =
      (for (d <- 0 to 6; i <- 0 until 10) yield ("s", Option(ts(d, i)))) ++
      (for (i <- 0 until 40) yield ("s", Option(ts(7, i)))) ++
      (for (i <- 0 until 10) yield ("s", Option(ts(8, i)))) ++
      (for (i <- 0 until 10) yield ("s", Option(ts(10, i)))) ++ // day 9 silent
      (for (d <- 0 to 2; i <- 0 until 5) yield ("t", Option(ts(d, i)))) ++
      Seq(("s", Option.empty[Timestamp]))
    val out = Anomaly.dailySpikes(rows.toDF("event_type", "ts"), "event_type", "ts")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("trail_days"), r.getAs[Long]("trail_sum"),
          r.getAs[Long]("ratio_q"), r.getAs[Long]("is_spike")))).toMap

    // null-ts row dropped: series s day counts are exactly the planted ones
    assert(out(("s", "2024-01-01"))._1 == 10)
    // days 0..6: baseline incomplete -> ratio -1, no flag
    (1 to 7).foreach { d =>
      val (_, trailDays, _, ratio, spike) = out(("s", f"2024-01-$d%02d"))
      assert(trailDays == (d - 1).toLong && ratio == -1L && spike == 0L, s"day $d gated")
    }
    // day 7 (Jan 8): full 7×10 baseline, 40 events = 4× mean -> spike,
    // ratio exactly 4 << 20
    assert(out(("s", "2024-01-08")) == ((40L, 7L, 70L, 4L * 1048576L, 1L)))
    // day 8 (Jan 9): baseline now contains the spike (100 total);
    // 10 events = 0.7× mean -> quiet; floor(10*7*2^20/100)
    assert(out(("s", "2024-01-09")) == ((10L, 7L, 100L, 10L * 7L * 1048576L / 100L, 0L)))
    // day 10 (Jan 11) after the silent day 9: ROWS frame spans the 7
    // preceding OBSERVED days (Jan 3..9, incl. the 40-spike) — no
    // zero-fill for the gap, so the sum is 5×10 + 40 + 10 = 100
    assert(out(("s", "2024-01-11")) == ((10L, 7L, 100L, 10L * 7L * 1048576L / 100L, 0L)))
    // series t never reaches 7 observed days: all gated
    assert(out.keys.count(_._1 == "t") == 3)
    out.filter(_._1._1 == "t").values.foreach { case (_, _, _, ratio, spike) =>
      assert(ratio == -1L && spike == 0L)
    }
  }
}
