package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Error-bounds the HLL++ sketch sheet of q32 against the exact counts
  * (the sketch column is engine-specific by construction, so it is
  * spec-bounded here rather than DuckDB-oracle-compared; the exact
  * columns oracle-check as q32). */
class ApproxDistinctSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_count_distinct stays within the HLL++ error bound of the exact count") {
    Seq(sf001, sf01).foreach { sf =>
      val rows = ExtensionQueries.approxDistinctUsers(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val approx = r.getAs[Long]("approx_users").toDouble
        val exact = r.getAs[Long]("exact_users").toDouble
        val relErr = math.abs(approx - exact) / math.max(exact, 1.0)
        // default rsd is 0.05; 3 standard deviations covers the sketch's
        // tail while still failing on any real regression
        assert(relErr <= 0.15,
          s"$sf ${r.getString(0)}: approx=$approx exact=$exact relErr=$relErr")
        assert(r.getAs[Long]("n_events") >= r.getAs[Long]("exact_users"))
      }
    }
  }
}
