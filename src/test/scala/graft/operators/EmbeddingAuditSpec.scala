package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[EmbeddingAudit.healthSheet]] pinned on a hand fixture with every
  * planted failure mode: null vectors, ragged dims, all-zero vectors,
  * NaN/Inf poisoning, the exact ×2^20 norm quantization, and the −1
  * convention for a label with no finite vector. q94 oracles the
  * arithmetic on driver data — where every embedding is clean and
  * unit-norm, so the failure paths live here. */
class EmbeddingAuditSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Q = 1048576L

  test("planted failure modes land in the right columns") {
    val rows: Seq[(Long, Array[Float])] = Seq(
      (0L, Array(3f, 4f)),                       // norm2 = 25 exactly
      (0L, Array(0f, 0f)),                       // zero vector
      (0L, Array(1f, 0f, 0f)),                   // ragged dim (3 vs 2)
      (0L, null),                                // null vector
      (1L, Array(Float.NaN, 1f)),                // NaN-poisoned norm
      (1L, Array(Float.PositiveInfinity, 1f)),   // Inf-poisoned norm
      (2L, Array(0.5f, 0.5f)))                   // norm2 = 0.5 exactly
    val out = rows.toDF("label", "embedding")
    val m = EmbeddingAudit.healthSheet(out).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap

    val l0 = m(0L)
    assert(l0.getAs[Long]("n_vecs") == 4 && l0.getAs[Long]("n_null") == 1)
    assert(l0.getAs[Long]("dim_min") == 2 && l0.getAs[Long]("dim_max") == 3,
      "ragged dims surface as dim_min != dim_max; the null vector rates no dim")
    assert(l0.getAs[Long]("n_zero") == 1 && l0.getAs[Long]("n_nonfinite") == 0)
    assert(l0.getAs[Long]("norm_min_q") == 0L &&
      l0.getAs[Long]("norm_max_q") == 25L * Q &&
      l0.getAs[Long]("norm_mean_q") == (25L * Q + 0L + 1L * Q) / 3L,
      "quantized stats cover the three finite vectors, null excluded")

    val l1 = m(1L)
    assert(l1.getAs[Long]("n_nonfinite") == 2 && l1.getAs[Long]("n_zero") == 0)
    assert(l1.getAs[Long]("norm_min_q") == -1L &&
      l1.getAs[Long]("norm_max_q") == -1L &&
      l1.getAs[Long]("norm_mean_q") == -1L,
      "a label with no finite vector reports the -1 convention")

    assert(m(2L).getAs[Long]("norm_mean_q") == Q / 2,
      "norm2 = 0.5 quantizes to exactly 2^19")
  }

  test("sheet is partition-invariant") {
    val rows = (0 until 200).map(i => (i % 3L, Array.fill(8)(i * 0.01f)))
    val a = EmbeddingAudit.healthSheet(rows.toDF("label", "embedding"))
      .orderBy("label").collect().toSeq
    val b = EmbeddingAudit.healthSheet(
        rows.toDF("label", "embedding").repartition(13))
      .orderBy("label").collect().toSeq
    assert(a == b, "per-row quantization makes every aggregate order-independent")
  }
}
