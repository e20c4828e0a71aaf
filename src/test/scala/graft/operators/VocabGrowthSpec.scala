package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[VocabGrowth.growthCurve]] pinned on a hand fixture: exact
  * per-bucket and cumulative counts, min(doc_id) first-occurrence
  * semantics (a term seen late in bucket 0 and again in bucket 3
  * counts once, in bucket 0), the sparse-bucket rule (absent row,
  * cumulative columns still correct), max_id landing in the last
  * bucket, and null-text drops from BOTH the doc count and the
  * vocabulary. q93 oracles the arithmetic on driver data — where the
  * synthetic vocab saturates in bucket 0, so the growth paths live
  * here. */
class VocabGrowthSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("planted curve: first occurrences, sparse buckets, cumulative sums") {
    // K=4 over max_id=7 -> bucket = id*4 div 8: ids 0-1|2-3|4-5|6-7.
    // Bucket 0: "a b" (id 0), "b c" (id 1)      -> new a,b,c
    // Bucket 1: "a a a" (id 2); id 3 null text  -> new none
    // Bucket 2: (no docs: ids 4-5 absent)
    // Bucket 3: "c d" (id 6), "e" (id 7 = max)  -> new d,e
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), (2L, "a a a"), (3L, null.asInstanceOf[String]),
      (6L, "c d"), (7L, "e")).toDF("doc_id", "text")
    val rows = VocabGrowth.growthCurve(docs, "text", buckets = 4)
      .orderBy("bucket")
      .collect().map(r => (r.getAs[Long]("bucket"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
         r.getAs[Long]("new_terms"), r.getAs[Long]("docs_cum"),
         r.getAs[Long]("tokens_cum"), r.getAs[Long]("vocab_cum"))))

    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 3L),
      "empty bucket 2 is absent by rule; the null-text doc drops bucket 1 to one doc")
    val m = rows.toMap
    assert(m(0L) == ((2L, 4L, 3L, 2L, 4L, 3L)))
    assert(m(1L) == ((1L, 3L, 0L, 3L, 7L, 3L)), "repeats of a/b add tokens, not vocab")
    assert(m(3L) == ((2L, 3L, 2L, 5L, 10L, 5L)), "max_id doc lands in the last bucket")
  }

  test("first occurrence is min(doc_id), not scan order, under repartitioning") {
    // "z" appears at ids 9, 1, 5 -> first_id = 1 -> bucket 0 of K=2
    // over max_id=9, whatever the partitioning does to row order.
    val docs = Seq((9L, "z"), (1L, "z"), (5L, "z"), (0L, "q"))
      .toDF("doc_id", "text").repartition(7)
    val m = VocabGrowth.growthCurve(docs, "text", buckets = 2)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("new_terms")).toMap
    assert(m(0L) == 2L && m.getOrElse(1L, 0L) == 0L,
      "both terms first-occur in bucket 0; the id-9 repeat adds no vocab")
  }

  test("degenerate shapes: one bucket, all-null corpus") {
    val one = VocabGrowth.growthCurve(
      Seq((0L, "a b a")).toDF("doc_id", "text"), "text", buckets = 1).collect()
    assert(one.length == 1 &&
      one.head.getAs[Long]("vocab_cum") == 2L &&
      one.head.getAs[Long]("tokens_cum") == 3L)

    val empty = VocabGrowth.growthCurve(
      Seq((0L, null.asInstanceOf[String])).toDF("doc_id", "text"), "text")
    assert(empty.count() == 0L, "an untokenizable corpus yields an empty sheet")

    assertThrows[IllegalArgumentException] {
      VocabGrowth.growthCurve(
        Seq((0L, "a")).toDF("doc_id", "text"), "text", buckets = 0)
    }
  }
}
