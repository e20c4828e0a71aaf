package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[SnapshotDiff]] semantics on hand fixtures: every status arm
  * (added / removed / modified / unchanged), NULL-content hashing as
  * the empty string on both sides, NULL keys joining neither
  * snapshot, removed rows keeping the OLD source, and the summary's
  * token accounting (absent sides contribute 0, Σ token_delta = the
  * corpus token change). q103 oracles the arithmetic bitwise on
  * driver data; this spec pins the edge paths the uniform driver
  * corpus never exercises. */
class SnapshotDiffSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // old: 1 unchanged, 2 modified, 3 removed, 5 null-text (stays null
  //      in new -> unchanged), null key (dropped)
  // new: adds 4; drops 3; edits 2
  private def oldSnap = Seq(
    (Option(1L), "a", Option("alpha beta")),
    (Option(2L), "a", Option("gamma delta")),
    (Option(3L), "b", Option("epsilon")),
    (Option(5L), "b", Option.empty[String]),
    (Option.empty[Long], "b", Option("ghost"))
  ).toDF("doc_id", "source", "text")

  private def newSnap = Seq(
    (Option(1L), "a", Option("alpha beta")),
    (Option(2L), "a", Option("gamma delta v2")),
    (Option(4L), "a", Option("zeta eta theta")),
    (Option(5L), "b", Option.empty[String]),
    (Option.empty[Long], "a", Option("ghost"))
  ).toDF("doc_id", "source", "text")

  test("diff labels every arm; null keys join neither snapshot") {
    val byKey = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
      .toMap
    assert(byKey == Map(1L -> "unchanged", 2L -> "modified",
      3L -> "removed", 4L -> "added", 5L -> "unchanged"))
  }

  test("summary counts, sides' token mass, and the delta identity") {
    val rows = SnapshotDiff.summarize(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("status")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_old"),
          r.getAs[Long]("tokens_new"), r.getAs[Long]("token_delta")))).toMap

    // added has tokens_old = 0; removed has tokens_new = 0 and keeps
    // the OLD source; the null-text pair is unchanged (null hashes as
    // '' on both sides, and '' counts 1 whitespace token — the
    // split-semantics parity pinned by the q102 oracle)
    assert(rows(("a", "added")) == ((1L, 0L, 3L, 3L)))
    assert(rows(("b", "removed")) == ((1L, 1L, 0L, -1L)))
    assert(rows(("a", "modified")) == ((1L, 2L, 3L, 1L)))
    assert(rows(("a", "unchanged")) == ((1L, 2L, 2L, 0L)))
    assert(rows(("b", "unchanged")) == ((1L, 1L, 1L, 0L)))
    assert(rows.size == 5)

    // the sheet's total delta IS the corpus-level token change
    assert(rows.values.map(_._4).sum == 3L)
  }
}
