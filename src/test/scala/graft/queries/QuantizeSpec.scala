package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** q75's int8 quantization summaries, re-derived per vector in plain
  * Scala (float widened to double, truncating division — the exact
  * kernel both engines run) and compared field-by-field. */
class QuantizeSpec extends AnyFunSuite {
  import TestSpark._

  test("q75 matches a plain-Scala recomputation on sf0.001") {
    val vecs = graft.sources.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rows = SparkEntry.queries("q75_embedding_quantize")(spark, sf001).collect()
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val v = vecs(id).map(_.toDouble)
      val scale = math.max(v.map(math.abs).max, 1e-30)
      val qv = v.map(x => (127.0 * x / scale).toLong)
      assert(r.getAs[Long]("n_dims") == v.size.toLong, s"vec $id n_dims")
      assert(r.getAs[Long]("q_min") == qv.min, s"vec $id q_min")
      assert(r.getAs[Long]("q_max") == qv.max, s"vec $id q_max")
      assert(r.getAs[Long]("q_sum") == qv.sum, s"vec $id q_sum")
      assert(r.getAs[Long]("q_l1") == qv.map(math.abs).sum, s"vec $id q_l1")
      assert(r.getAs[Long]("n_sat") == qv.count(q => math.abs(q) == 127L), s"vec $id n_sat")
      // the kernel's contract: the max-|x| coordinate quantizes to ±127
      assert(r.getAs[Long]("n_sat") >= 1L, s"vec $id must saturate its argmax")
    }
  }

  test("q75 plans as a single zero-shuffle projection") {
    val df = SparkEntry.queries("q75_embedding_quantize")(spark, sf001)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"), "q75 must not shuffle")
  }
}
