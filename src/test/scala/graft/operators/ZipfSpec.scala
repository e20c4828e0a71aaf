package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** [[Zipf.rankFrequencyFit]] — the OLS sums must recompute exactly
  * from a hand-built term census, a planted power law must read its
  * own slope back, and a flat (uniform) vocabulary must read slope
  * ≈ 0 — the template-injection smell the sheet exists to flag. */
class ZipfSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def log2q(x: Long): Long = {
    // the Mixing.log2qExpr kernel replayed: e = floor(log2 x), then 6
    // squaring rounds on the mantissa normalized into [2^20, 2^21)
    require(x > 0)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e > 20) x / (1L << (e - 20)) else x * (1L << (20 - e))
    var f = 0L
    for (_ <- 1 to 6) {
      val sq = m * m / 1048576L
      if (sq >= 2097152L) { m = sq / 2; f = f * 2 + 1 }
      else { m = sq; f = f * 2 }
    }
    e * 64L + f
  }

  test("sums and slope recompute from a hand census (planted power law reads ~-1)") {
    // term t_r appears floor(1024 / r) times for rank r = 1..64: an
    // exact discrete power law with exponent -1
    val words = (1 to 64).flatMap { r =>
      Seq.fill(1024 / r)(f"w$r%03d")
    }
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = Zipf.rankFrequencyFit(docs).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Long]("n_terms") == 64L)
    assert(row.getAs[Long]("n_tokens") == words.length.toLong)
    assert(row.getAs[Long]("n_fit") == 64L)
    // hand-recompute the OLS sums: ranks are (cnt DESC, term ASC);
    // floor(1024/r) is strictly decreasing for r <= 32 then ties —
    // ties break by term name, which matches rank order by naming
    val census = (1 to 64).map(r => (r.toLong, (1024 / r).toLong))
    val xs = census.map(c => log2q(c._1))
    val ys = census.map(c => log2q(c._2))
    assert(row.getAs[Long]("sum_x") == xs.sum)
    assert(row.getAs[Long]("sum_y") == ys.sum)
    assert(row.getAs[Long]("sum_xx") == xs.map(x => x * x).sum)
    assert(row.getAs[Long]("sum_xy") == xs.zip(ys).map { case (x, y) => x * y }.sum)
    val n = 64L
    val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum
    val den = n * xs.map(x => x * x).sum - xs.sum * xs.sum
    assert(row.getAs[Long]("slope_num") == num)
    assert(row.getAs[Long]("slope_den") == den)
    val slope = row.getAs[Double]("slope")
    assert(slope == num.toDouble / den)
    assert(slope < -0.85 && slope > -1.15,
      s"planted 1/r law must read slope ~-1, got $slope")
    info(f"planted power-law slope: $slope%.4f")
  }

  test("a flat vocabulary reads slope ~0 (the template-injection smell)") {
    // every term exactly 16 times: log2 count is constant, so the
    // regression of y on x is flat
    val words = (1 to 200).flatMap(r => Seq.fill(16)(f"t$r%03d"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = Zipf.rankFrequencyFit(docs).collect().head
    assert(row.getAs[Double]("slope") == 0.0,
      s"uniform counts must fit exactly flat, got ${row.getAs[Double]("slope")}")
  }

  test("driver corpus reads a Zipf-ish negative slope; degenerate inputs are total") {
    val docs = Tables.documents(spark, sf001)
    val row = Zipf.rankFrequencyFit(docs).collect().head
    val slope = row.getAs[Double]("slope")
    assert(slope < 0.0, s"driver corpus slope must be negative, got $slope")
    assert(row.getAs[Long]("n_fit") <= 4096L)
    info(f"driver corpus: ${row.getAs[Long]("n_terms")} terms, slope $slope%.4f")
    // empty corpus: one total row, slope undefined idiom
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val erow = Zipf.rankFrequencyFit(empty).collect().head
    assert(erow.getAs[Long]("n_fit") == 0L && erow.getAs[Double]("slope") == -1.0)
    // parameter bounds throw
    assertThrows[IllegalArgumentException] {
      Zipf.rankFrequencyFit(docs, fitRanks = 1)
    }
  }
}
