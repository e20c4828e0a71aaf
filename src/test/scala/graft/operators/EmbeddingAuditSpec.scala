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

  test("label separation: planted axes, a duplicated class, a zero-centroid class") {
    // label 0 ~ e1 (one jittered copy), label 1 = e2 exactly,
    // label 2 = e1 scaled (same DIRECTION as 0), label 3 = a symmetric
    // cloud whose centroid is exactly zero (the guard path);
    // degenerates (null label, null vector, ragged dim) are excluded
    val rows: Seq[(java.lang.Long, Array[Float])] =
      Seq.fill(4)((java.lang.Long.valueOf(0L), Array(1f, 0f, 0f, 0f))) ++ Seq(
        (java.lang.Long.valueOf(0L), Array(1f, 0.04f, 0f, 0f)),
        (java.lang.Long.valueOf(1L), Array(0f, 1f, 0f, 0f)),
        (java.lang.Long.valueOf(1L), Array(0f, 1f, 0f, 0f)),
        (java.lang.Long.valueOf(1L), Array(0f, 1f, 0f, 0f)),
        (java.lang.Long.valueOf(1L), Array(0f, 1f, 0f, 0f)),
        (java.lang.Long.valueOf(1L), Array(0f, 1f, 0f, 0f)),
        (java.lang.Long.valueOf(2L), Array(2f, 0f, 0f, 0f)),
        (java.lang.Long.valueOf(2L), Array(2f, 0f, 0f, 0f)),
        (java.lang.Long.valueOf(2L), Array(2f, 0f, 0f, 0f)),
        (java.lang.Long.valueOf(3L), Array(1f, 1f, 0f, 0f)),
        (java.lang.Long.valueOf(3L), Array(-1f, -1f, 0f, 0f)),
        (java.lang.Long.valueOf(3L), Array(1f, -1f, 0f, 0f)),
        (java.lang.Long.valueOf(3L), Array(-1f, 1f, 0f, 0f)),
        (null, Array(9f, 9f, 9f, 9f)),             // unlabeled: excluded
        (java.lang.Long.valueOf(0L), Array(1f, 0f)),  // ragged: excluded
        (java.lang.Long.valueOf(0L), null))           // null vec: excluded
    val out = EmbeddingAudit.labelSeparationSheet(
        rows.toDF("label", "embedding"), dim = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getLong(6)))).toMap
    assert(out.size == 10, "4 labels -> 10 unordered pairs incl. diagonal")
    // exact arithmetic on the clean classes
    val Q2 = Q * Q
    assert(out((1L, 1L)) == ((5L, 5L, Q2, 1.0, 0L)),
      "an exact one-hot class: unit centroid, cos 1, zero scatter")
    assert(out((2L, 2L))._5 == 0L, "a constant class has zero scatter")
    assert(out((1L, 2L))._3 == 0L && out((1L, 2L))._4 == 0.0,
      "orthogonal axes read dot 0, cos exactly 0")
    assert(out((0L, 2L))._4 > 0.99, "same-direction classes read cos ~ 1")
    assert(math.abs(out((0L, 0L))._4 - 1.0) < 1e-12, "diagonal cosine ~ 1")
    // the zero-centroid cloud: selfq = 0 trips the guard, scatter is
    // exactly its mean squared norm (2 per vector, in 2^20 units)
    assert(out((3L, 3L)) == ((4L, 4L, 0L, 0.0, 2L * Q)))
    assert(out((0L, 3L))._4 == 0.0 && out((0L, 3L))._5 == -1L,
      "off-diagonal rows carry the -1 scatter sentinel")
    // exclusions: label 0 counts its 5 clean vectors only
    assert(out((0L, 0L))._1 == 5L)
  }
}
