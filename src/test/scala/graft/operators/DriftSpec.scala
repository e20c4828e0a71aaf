package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions.col

/** [[Drift.termDrift]] decisions pinned on a hand fixture with
  * planted drift: the up/down flags fire on rate (not raw-count)
  * changes, a count-stable term in differently-sized slices is rated
  * by rate, new/vanished vocabulary gets the −1 ratio and the right
  * flag, the exact quantized ratio, the minTotal gate, and null-text
  * drops. q92 oracles the arithmetic on driver data — where the
  * synthetic vocab is uniform, so the fire paths live here. */
class DriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Q = 1048576L

  test("planted drift fires by rate; new and vanished vocab flagged") {
    // Slice A (ids 0..9): 10 docs of "base base base base stable" -> 50 tokens.
    // Slice B (ids 10..14): 5 docs of "base base boom boom boom
    // boom boom stable fresh x" -> 50 tokens. So N_a = N_b = 50.
    //   base: 40 -> 10   (rate 4x down)     -> drift_dir -1
    //   boom: 0 -> 25    (new vocab)        -> ratio -1, drift_dir +1
    //   stable: 10 -> 5  (rate 10/50 vs 5/50 = 2x down) -> -1
    //   fresh: 0 -> 5    (below minTotal=10) -> gated out
    val docs = (0 until 10).map(i => (i.toLong, "base base base base stable")) ++
      (10 until 15).map(i => (i.toLong, "base base boom boom boom boom boom stable fresh x"))
    val out = Drift.termDrift(docs.toDF("doc_id", "text"), "text",
        col("doc_id") < 10, minTotal = 10L, num = 3L, den = 2L)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Long]("ratio_q"), r.getAs[Long]("drift_dir")))).toMap

    assert(out("base") == ((40L, 10L, 10L * 50L * Q / (40L * 50L), -1L)))
    assert(out("boom") == ((0L, 25L, -1L, 1L)))
    assert(out("stable") == ((10L, 5L, 5L * 50L * Q / (10L * 50L), -1L)))
    assert(!out.contains("fresh") && !out.contains("x"), "minTotal gates rare terms")
  }

  test("rate ratio is slice-size-normalized; stable terms stay quiet") {
    // A has 3x the volume of B; "even" keeps the same RATE in both
    // (6/30 vs 2/10) -> ratio exactly 1<<20, no flag, even though raw
    // counts drop 3x. Null text contributes nothing.
    val docs = (0 until 3).flatMap(i => Seq(
        (i.toLong * 2, Option("even odd odd odd odd pad pad pad pad pad")))) ++
      Seq((1L, Option("even odd odd odd pad pad pad pad pad pad")), (3L, Option.empty[String]))
    val out = Drift.termDrift(docs.toDF("doc_id", "text"), "text",
        col("doc_id") % 2 === 0, minTotal = 4L, num = 3L, den = 2L)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Long]("ratio_q"), r.getAs[Long]("drift_dir")))).toMap

    assert(out("even") == ((3L, 1L, Q, 0L)))
    // odd: rate 0.4 -> 0.3 is only a 1.33x drop — inside the 1.5x band
    assert(out("odd") == ((12L, 3L, 3L * 30L * Q / (12L * 10L), 0L)))
    intercept[IllegalArgumentException] {
      Drift.termDrift(docs.toDF("doc_id", "text"), "text", col("doc_id") < 2, num = 1L, den = 1L)
    }
  }
}
