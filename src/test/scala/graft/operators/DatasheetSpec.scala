package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Datasheet.summarize]] pinned on a hand corpus where every metric
  * is countable by eye — including the interactions the driver corpus
  * can't exercise: null text (counts in n_docs, zero tokens, absent
  * from vocabulary/median), an exact duplicate (one dup doc, and only
  * the min-id copy can survive curation), and a median over an even
  * split. q100 oracles the arithmetic at scale. */
class DatasheetSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("every metric of the planted corpus is exact") {
    val kept =
      "the quick brown fox jumps over the lazy dog and then the cat naps by the fire all day long"
    val docs = Seq(
      (1L, "en", Option(kept), "s1"),                       // 20 tokens, kept
      (2L, "en", Option(kept), "s1"),                       // exact dup of 1
      (3L, "en", Option("tiny text"), "s2"),                // 2 tokens, too_short
      (4L, "de", Option("kurz und gut aber nicht lang genug heute"), "s2"), // non_english
      (5L, "en", Option.empty[String], "s3"))               // null text
      .toDF("doc_id", "lang", "text", "source")
    val m = Datasheet.summarize(docs).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap

    assert(m("n_docs") == 5L)
    assert(m("n_text_docs") == 4L, "null text counts as a doc, not a text doc")
    assert(m("n_tokens") == 20L + 20L + 2L + 8L, "null text contributes 0 tokens")
    assert(m("n_langs") == 2L && m("n_sources") == 3L)
    assert(m("n_exact_dup_docs") == 1L, "two identical texts = one surplus doc")
    // distinct lower-cased terms: kept has 17 distinct of its 20
    // ("the" x4, "and"? appears once... counted below), plus tiny(2) + de(8)
    assert(m("n_distinct_terms") ==
      (kept.split("\\s+").map(_.toLowerCase).toSet ++
        Set("tiny", "text") ++
        "kurz und gut aber nicht lang genug heute".split(" ").toSet).size.toLong)
    assert(m("p50_doc_tokens") == 8L,
      "even split 2,8,20,20 -> rank ceil(0.5*4)=2 picks 8")
    assert(m("curation_kept_docs") == 1L,
      "doc 2 loses dedup, 3 and 4 are under 20 tokens, 5 is null -> only doc 1")
    assert(m.size == 9)
  }
}
