package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Error-bounds the approx_percentile sketch sheet of q60 against the
  * exact discrete percentiles (the exact columns oracle-check as q60;
  * the sketch is engine-specific so it is bounded here instead).
  *
  * The bound checked is the sketch's REAL contract — rank error ≤
  * n/accuracy — not value error, which approx_percentile does not
  * guarantee on skewed value distributions. */
class QuantileSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_percentile rank error stays within the accuracy bound of the exact quantiles") {
    val targets = Seq(0.25, 0.50, 0.75, 0.95)
    Seq(sf001, sf01).foreach { sf =>
      val rows = ExtensionQueries.approxQuantiles(spark, sf).collect()
      assert(rows.nonEmpty)
      // per-group sorted values for local rank computation (bounded:
      // test scale only — the operator itself never collects)
      val byFlag = Tables.lineitem(spark, sf)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
      rows.foreach { r =>
        val flag = r.getString(0)
        val vals = byFlag(flag)
        val n = vals.length.toDouble
        val approx = r.getSeq[Double](1)
        val exact = Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
        assert(r.getAs[Long]("n_rows") == vals.length.toLong)
        targets.indices.foreach { i =>
          // cdf of the approx value must sit within rank tolerance of
          // the target quantile; accuracy=10000 → 1e-4, widened 5× for
          // duplicate-value plateaus at the boundary
          val cdfLo = vals.count(_ < approx(i)) / n
          val cdfHi = vals.count(_ <= approx(i)) / n
          val tol = 5.0 / 10000.0
          assert(cdfLo - tol <= targets(i) && targets(i) <= cdfHi + tol,
            s"$sf $flag q=${targets(i)}: approx=${approx(i)} cdf=[$cdfLo,$cdfHi]")
          // and the approx value can never cross a neighboring exact quantile badly
          assert(approx(i) >= exact.head - math.abs(exact.head) &&
            approx(i) <= exact.last + math.abs(exact.last))
        }
      }
    }
  }
}
