package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[Similarity.ivfDrift]] — incremental ANN maintenance — on PLANTED
  * geometry (q82 oracles the arithmetic on driver data; this spec
  * proves the decisions mean something): four well-separated clusters
  * seed the standing index; an incoming batch drawn from the same
  * distribution must NOT trigger refresh, a batch that drifted away
  * from its centroid must; and the cheap incremental assignment must
  * agree with a full rebuild on where new points live. */
class IncrementalAnnSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val dim = 16
  private val clusters = 4

  /** Cluster c's center: 10·e_c (pairwise orthogonal, norm 10). */
  private def center(c: Int): Array[Float] = {
    val v = new Array[Float](dim); v(c) = 10f; v
  }

  private def sample(c: Int, n: Int, rnd: scala.util.Random,
      shift: Option[Int] = None): Seq[Array[Float]] =
    Seq.fill(n) {
      val v = center(c).clone()
      shift.foreach(axis => v(axis) += 5f) // 26° off the standing centroid
      v.map(x => x + 0.3f * rnd.nextGaussian().toFloat)
    }

  // old corpus: 40 points per cluster; id layout c*1000 + j, so the
  // seed of cluster c is id c*1000 and cells stay attributable
  private val rnd = new scala.util.Random(11)
  private val old = (0 until clusters).flatMap { c =>
    sample(c, 40, rnd).zipWithIndex.map { case (v, j) => (c * 1000L + j, v) }
  }
  private lazy val oldDf = old.toDF("vec_id", "embedding")
  private lazy val seeds = oldDf.filter(col("vec_id") % 1000 === 0)
  private lazy val standing = Similarity.kmeansIterate(oldDf, seeds, iters = 2, dim = dim)

  test("same-distribution batch keeps refresh=0; drifted batch flags its cell") {
    val rnd2 = new scala.util.Random(12)
    // clusters 0-2 send stationary points; cluster 3's batch DRIFTED
    val fresh = (0 until clusters).flatMap { c =>
      val pts = sample(c, 10, rnd2, shift = if (c == 3) Some(7) else None)
      pts.zipWithIndex.map { case (v, j) => (9000L + c * 100L + j, v) }
    }.toDF("vec_id", "embedding")
    val report = Similarity.ivfDrift(oldDf, fresh, standing, dim = dim)
      .collect().map(r => r.getAs[Long]("c_id") ->
        ((r.getAs[Long]("n_old"), r.getAs[Long]("n_new"),
          r.getAs[Long]("mean_old_q"), r.getAs[Long]("mean_new_q"),
          r.getAs[Long]("refresh")))).toMap
    assert(report.keySet == Set(0L, 1000L, 2000L, 3000L))
    (0 to 2).map(_ * 1000L).foreach { cell =>
      val (nOld, nNew, _, _, refresh) = report(cell)
      assert((nOld, nNew) == ((40L, 10L)), s"cell $cell population")
      assert(refresh == 0L, s"stationary cell $cell must not refresh: $report")
    }
    val (nOld3, nNew3, meanOld3, meanNew3, refresh3) = report(3000L)
    assert((nOld3, nNew3) == ((40L, 10L)))
    assert(meanNew3 > 2 * meanOld3, "drifted batch must sit measurably farther out")
    assert(refresh3 == 1L, s"drifted cell must refresh: $report")
  }

  test("incremental assignment agrees with a full rebuild on >= 90% of new points") {
    val rnd3 = new scala.util.Random(13)
    val fresh = (0 until clusters).flatMap { c =>
      sample(c, 10, rnd3).zipWithIndex.map { case (v, j) => (9500L + c * 100L + j, v) }
    }.toDF("vec_id", "embedding")
    val rebuilt = Similarity.kmeansIterate(oldDf.union(fresh), seeds, iters = 2, dim = dim)
    def cellsOf(cent: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.ivfAssign(fresh, cent, dim)
        .collect().map(r => r.getAs[Long]("n_id") -> r.getAs[Long]("c_id")).toMap
    val incremental = cellsOf(standing)
    val full = cellsOf(rebuilt)
    val agree = incremental.count { case (id, cell) => full.get(id).contains(cell) }
    info(s"incremental-vs-rebuild cell agreement: $agree/${incremental.size}")
    assert(incremental.size == clusters * 10)
    assert(agree >= (0.9 * incremental.size).toInt,
      s"only $agree/${incremental.size} new points kept their cell")
  }
}
