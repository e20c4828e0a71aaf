package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[SpaceSaving.TopKAgg]], bounded against q51-style exact term
  * counts (the sketch-sheet pattern of q32/HLL and q60/GK: the sketch
  * is arrival-order-dependent, so it is error-bounded, not
  * oracle-compared). The same corpus is aggregated under several
  * partitionings to exercise different merge orders. */
class SpaceSavingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tokens = graft.sources.Tables.documents(spark, sf01)
    .select(explode(TextFunctions.tokens(col("text"))).as("w"))

  test("heavy terms present and estimates within N/m across merge orders") {
    val exact = tokens.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val m = 64
    Seq(1, 7, 32).foreach { parts =>
      val approx = tokens.repartition(parts).as[String]
        .select(SpaceSaving.TopKAgg(m).toColumn).head()
      // presence: every term with true frequency > 2N/m is in the summary
      exact.filter(_._2 > 2 * n / m).keys.foreach { hh =>
        assert(approx.contains(hh), s"parts=$parts heavy term $hh missing")
      }
      // accuracy: every reported count within N/m of its exact count
      approx.foreach { case (w, est) =>
        val truth = exact.getOrElse(w, 0L)
        assert(math.abs(est - truth) <= n / m,
          s"parts=$parts $w est=$est exact=$truth bound=${n / m}")
      }
      assert(approx.size <= m)
    }
  }

  test("capacity-1 degenerates to a majority-candidate summary") {
    val approx = Seq("a", "b", "a", "c", "a", "a").toDS()
      .select(SpaceSaving.TopKAgg(1).toColumn).head()
    assert(approx.size == 1) // Boyer-Moore-like: one surviving candidate
  }
}
