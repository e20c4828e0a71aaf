package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[SourceOverlap.overlapMatrix]] pinned on planted provenance: a
  * cross-source copy lands in the canonical off-diagonal cell, a
  * within-source re-post lands on the diagonal, unrelated docs
  * produce no cell, and (A,B)/(B,A) collisions canonicalize into ONE
  * cell whatever the doc-id order. q95 oracles the full
  * MinHash→LSH→Jaccard arithmetic on driver data; the semantics live
  * here. */
class SourceOverlapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val wire =
    "the central bank raised its key interest rate by a quarter point on tuesday citing persistent inflation pressure"
  private val recipe =
    "slice the onions thinly and cook them slowly in butter until golden brown then add the stock and simmer gently"
  private val essay =
    "few inventions have reshaped daily life as quietly and as completely as the humble shipping container has done"

  test("cross-source and within-source duplication land in the right cells") {
    // feedB copies feedA's wire story (cross-source cell, and the id
    // order puts the LARGER id in feedA so canonicalization is doing
    // real work); feedB re-posts its own recipe (diagonal cell); the
    // essay is unique and contributes nothing.
    val docs = Seq(
      (10L, wire, "feedB"),
      (11L, wire, "feedA"),
      (12L, recipe, "feedB"),
      (13L, recipe, "feedB"),
      (14L, essay, "feedC")).toDF("doc_id", "text", "source")
    val cells = SourceOverlap.overlapMatrix(docs).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Long]("n_pairs")).toMap
    assert(cells == Map(("feedA", "feedB") -> 1L, ("feedB", "feedB") -> 1L),
      "one canonical cross-source cell, one diagonal cell, no essay cell")
  }

  test("composed entry reuses a standing pair relation — no second shingle pass") {
    val docs = Seq(
      (10L, wire, "feedB"),
      (11L, wire, "feedA"),
      (12L, recipe, "feedB"),
      (13L, recipe, "feedB"),
      (14L, essay, "feedC")).toDF("doc_id", "text", "source")
    val standing = Dedup.materialize(Dedup.nearDupPairs(docs))
    val composed = SourceOverlap.overlapMatrixFromPairs(standing, docs)
    // the composed plan consumes the materialized pair frame: zero
    // Generate nodes (the shingle/band explodes all live upstream of
    // the checkpoint) — just the two provenance joins + count.
    val plan = composed.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"composed plan must not re-run the shingle/band explodes:\n$plan")
    assert(composed.orderBy("src_a", "src_b").collect().toSeq ==
      SourceOverlap.overlapMatrix(docs).orderBy("src_a", "src_b").collect().toSeq,
      "composed sheet equals the standalone sheet on the same corpus")
  }

  test("matrix is partition-invariant") {
    val docs = Seq(
      (1L, wire, "a"), (2L, wire, "b"), (3L, wire, "c"),
      (4L, recipe, "a"), (5L, recipe, "a")).toDF("doc_id", "text", "source")
    val one = SourceOverlap.overlapMatrix(docs)
      .orderBy("src_a", "src_b").collect().toSeq
    val many = SourceOverlap.overlapMatrix(docs.repartition(11))
      .orderBy("src_a", "src_b").collect().toSeq
    assert(one == many)
    // three identical wire copies across a/b/c -> all three pair cells
    assert(one.map(r => (r.getString(0), r.getString(1), r.getLong(2))) ==
      Seq(("a", "a", 1L), ("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
  }
}
