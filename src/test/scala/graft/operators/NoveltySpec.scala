package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Novelty.noveltyScores]] pinned on planted shingle overlap: a doc
  * of corpus-unique phrases scores 2^20, a verbatim copy zeroes BOTH
  * itself and its original (shared shingles have df = 2), a doc
  * repeating one phrase many times still counts it ONCE (doc-local
  * distinct), sub-3-token docs are absent, and the score is
  * partition-invariant. q100's corpus runs the arithmetic at scale;
  * the semantics live here. */
class NoveltySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Q = 1048576L

  test("unique, copied, and half-shared docs score exactly") {
    // doc 0: 4 tokens -> 2 shingles, nowhere else -> novelty 2^20.
    // docs 1, 2: identical 5-token texts -> every shingle df=2 ->
    //   novelty 0 for BOTH (a copy destroys its original's novelty
    //   too — that is the point of the marginal view).
    // doc 3: shares its first 3 tokens with doc 0's start? no — built
    //   so exactly 1 of its 2 shingles also appears in doc 4 -> 1/2.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "epsilon zeta eta theta iota"),
      (2L, "epsilon zeta eta theta iota"),
      (3L, "kappa lambda mu nu"),
      (4L, "kappa lambda mu xi"),
      (5L, "pi rho")).toDF("doc_id", "text")
    val m = Novelty.noveltyScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sh"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("novelty_q"), r.getAs[Long]("is_novel")))).toMap

    assert(m(0L) == ((2L, 2L, Q, 1L)))
    assert(m(1L) == ((3L, 0L, 0L, 0L)) && m(2L) == ((3L, 0L, 0L, 0L)),
      "a verbatim copy zeroes both directions")
    // doc 3 shingles: "kappa lambda mu" (also in doc 4 -> df=2),
    // "lambda mu nu" (unique); doc 4: "kappa lambda mu" (df=2),
    // "lambda mu xi" (unique)
    assert(m(3L) == ((2L, 1L, Q / 2, 0L)), "exactly half novel, majority flag off")
    assert(m(4L) == ((2L, 1L, Q / 2, 0L)))
    assert(!m.contains(5L), "docs under 3 tokens have no shingle vocabulary")
  }

  test("doc-local repetition counts a shingle once; scores are partition-invariant") {
    val docs = Seq(
      (1L, "spam ham eggs spam ham eggs spam ham eggs"),
      (2L, "one two three four")).toDF("doc_id", "text")
    val one = Novelty.noveltyScores(docs).orderBy("doc_id").collect().toSeq
    val many = Novelty.noveltyScores(docs.repartition(9)).orderBy("doc_id").collect().toSeq
    assert(one == many)
    // 9 tokens -> positions 1..7, but only 3 DISTINCT shingle values
    // ("spam ham eggs", "ham eggs spam", "eggs spam ham")
    assert(one.head.getAs[Long]("n_sh") == 3L,
      "array_distinct collapses the doc-local repetition before the df count")
    assert(one.head.getAs[Long]("novelty_q") == Q, "all three are corpus-unique")
  }
}
