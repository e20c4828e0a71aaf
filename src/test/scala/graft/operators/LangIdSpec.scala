package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[LangId]] semantics on planted fixtures: a bilingual corpus with
  * disjoint character distributions separates perfectly, degenerate
  * inputs follow the documented conventions, and the decision is a
  * pure function of the data. q181 oracles the full fixed-point
  * arithmetic bitwise on driver data; this spec proves the operator
  * actually IDENTIFIES languages when the signal exists (the driver
  * corpus's labels are synthetic, so q181 alone can't show that). */
class LangIdSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // two "languages" with disjoint alphabets: every char trigram of one
  // is unseen in the other, the clean separability regime
  private def bilingual = (
    (1 to 30).map(i => (i.toLong, "avava vavav aavva avvaa", "ava")) ++
    (31 to 60).map(i => (i.toLong, "ozozo zozoz oozzo ozzoo", "ozo"))
  ).toDF("doc_id", "text", "lang")

  test("planted bilingual corpus separates perfectly with positive margins") {
    val rows = LangId.langIdScores(bilingual).collect()
    assert(rows.nonEmpty, "held-out split is non-empty")
    // both classes must be represented in the held-out half for the
    // assertion to mean anything (deterministic md5 split — stable)
    assert(rows.map(_.getAs[String]("lang")).toSet == Set("ava", "ozo"))
    for (r <- rows) {
      assert(r.getAs[String]("predicted_lang") == r.getAs[String]("lang"),
        s"doc ${r.getAs[Long]("doc_id")} misidentified")
      assert(r.getAs[Long]("margin_q") > 0L,
        s"doc ${r.getAs[Long]("doc_id")} margin not positive")
      assert(r.getAs[Long]("n_grams") > 0L)
    }
    // the confusion sheet is purely diagonal
    val conf = LangId.langIdConfusion(bilingual).collect()
    assert(conf.forall(r =>
      r.getAs[String]("lang") == r.getAs[String]("predicted_lang")))
    assert(conf.map(_.getAs[Long]("n_docs")).sum == rows.length)
  }

  test("degenerate inputs: null text scores prior-only, null lang is 'unknown', single class has zero margin") {
    // null-text docs land in the grid with no features: prior-only
    val withNullText = bilingual.union(
      Seq((100L, null.asInstanceOf[String], "ava"),
        (101L, null.asInstanceOf[String], "ozo"))
        .toDF("doc_id", "text", "lang"))
    val nt = LangId.langIdScores(withNullText)
      .filter(col("doc_id") >= 100L).collect()
    for (r <- nt) {
      assert(r.getAs[Long]("n_grams") == 0L)
      assert(Set("ava", "ozo").contains(r.getAs[String]("predicted_lang")))
      assert(r.getAs[Long]("margin_q") >= 0L)
    }

    // null labels group as the literal 'unknown' (the q76 idiom)
    val withNullLang = (1 to 20).map(i =>
      (i.toLong, "avava vavav", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    val nl = LangId.langIdScores(withNullLang).collect()
    assert(nl.nonEmpty && nl.forall(_.getAs[String]("lang") == "unknown"))
    assert(nl.forall(_.getAs[String]("predicted_lang") == "unknown"))

    // a single-class corpus predicts that class with margin exactly 0
    val solo = (1 to 20).map(i => (i.toLong, "avava vavav", "solo"))
      .toDF("doc_id", "text", "lang")
    val sr = LangId.langIdScores(solo).collect()
    assert(sr.forall(r => r.getAs[String]("predicted_lang") == "solo" &&
      r.getAs[Long]("margin_q") == 0L))

    // docs shorter than one trigram carry no features
    val tiny = ((1 to 10).map(i => (i.toLong, "avava vavav", "ava")) ++
      Seq((99L, "ab", "ava"))).toDF("doc_id", "text", "lang")
    val tr = LangId.langIdScores(tiny).filter(col("doc_id") === 99L).collect()
    assert(tr.forall(_.getAs[Long]("n_grams") == 0L))
  }

  test("prediction is a pure function of the data") {
    val a = LangId.langIdScores(bilingual).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("predicted_lang"),
        r.getAs[Long]("margin_q"))).toSet
    val b = LangId.langIdScores(bilingual.repartition(7)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("predicted_lang"),
        r.getAs[Long]("margin_q"))).toSet
    assert(a == b)
  }
}
