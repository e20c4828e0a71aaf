package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

class QualityRulesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def matrixOf(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    QualityRules.overlapMatrix(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("overlapMatrix: planted co-fires count exactly; clean docs count nowhere") {
    // A "kurz text" (de): fires ALL FOUR — too_short (2 tokens);
    //    non_english; repetitive (the small-doc bigram-mass line:
    //    50·1 > 9·1); low_stopword (zero stopword mass).
    // B "the cat sat here now" (en): too_short (5 tokens) AND
    //    repetitive (50·1 > 9·4) — but NOT low_stopword (50·1 ≥ 5).
    // C 30×"word" (en): repetitive (run 30) and low_stopword (zero
    //    stopwords), NOT too_short.
    // D 6 distinct stopwords + 25 distinct content words (en): no
    //    rule fires (top counts all 1, no runs, no duplicate grams,
    //    heavy stopword mass).
    val clean = "the of a it is and " + (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "kurz text", "de"),
      (2L, "the cat sat here now", "en"),
      (3L, Array.fill(30)("word").mkString(" "), "en"),
      (4L, clean, "en")
    ).toDF("doc_id", "text", "lang")
    val m = matrixOf(docs)
    assert(m.size == 10, "4 rules -> 10 unordered pairs")
    assert(m(("too_short", "too_short")) == 2L, s"A and B: $m")
    assert(m(("non_english", "non_english")) == 1L)
    assert(m(("repetitive", "repetitive")) == 3L, "A and B (bigram-mass), C (run)")
    assert(m(("low_stopword", "low_stopword")) == 2L, "A and C")
    assert(m(("too_short", "non_english")) == 1L, "only A co-fires these")
    assert(m(("too_short", "repetitive")) == 2L, "A and B")
    assert(m(("too_short", "low_stopword")) == 1L, "A only — B clears stopword mass")
    assert(m(("non_english", "repetitive")) == 1L)
    assert(m(("non_english", "low_stopword")) == 1L)
    assert(m(("repetitive", "low_stopword")) == 2L, "A and C")
    // subset bound: every off-diagonal <= both diagonals
    val names = QualityRules.RuleNames
    for (i <- names.indices; j <- i + 1 until names.size) {
      val ab = m((names(i), names(j)))
      assert(ab <= m((names(i), names(i))) && ab <= m((names(j), names(j))))
    }
  }

  test("overlapMatrix diagonals dominate the q74 audit's precedence counts on the corpus") {
    // precedence only HIDES rule fires (a doc dying earlier never
    // shows later rules) — so per rule: independent kills >= audit
    // reasons, with exact equality for the first rule in precedence
    val docs = Tables.documents(spark, sf001)
    val m = matrixOf(docs)
    val audit = QualityRules.audit(docs).groupBy(col("reason")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    QualityRules.RuleNames.foreach { r =>
      assert(m((r, r)) >= audit.getOrElse(r, 0L),
        s"$r: independent ${m((r, r))} < audit ${audit.getOrElse(r, 0L)}")
    }
    assert(m(("too_short", "too_short")) == audit.getOrElse("too_short", 0L),
      "the first precedence rule is never hidden")
  }
}
