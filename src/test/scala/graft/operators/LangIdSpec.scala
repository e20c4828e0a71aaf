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

  test("applyLangId: threshold 0 is plain argmax; the act labels every doc; NULL ids never emit") {
    val rows = LangId.applyLangId(bilingual).collect()
    assert(rows.length == 60, "the act labels the WHOLE corpus, train docs included")
    // marginThresholdQ = 0 ≡ plain argmax (margins are non-negative)
    assert(rows.forall(r => r.getAs[Long]("margin_q") >= 0L))
    assert(rows.forall(r =>
      r.getAs[String]("lang_id") == r.getAs[String]("predicted_lang")))
    // planted accuracy floor: every doc reads its true language
    assert(rows.forall(r =>
      r.getAs[String]("lang_id") == r.getAs[String]("lang")))
    // single-sourced with the evidence: the held-out docs' predictions
    // are bitwise the q181 sheet's
    val ev = LangId.langIdScores(bilingual).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[String]("predicted_lang"), r.getAs[Long]("margin_q"))).toSet
    val acts = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
      r.getAs[String]("predicted_lang"), r.getAs[Long]("margin_q"))).toSet
    assert(ev.nonEmpty && ev.subsetOf(acts),
      "the act drifted from the evidence sheet")
    // a sky-high threshold abstains everything (the CCNet drop)
    val hi = LangId.applyLangId(bilingual, marginThresholdQ = Long.MaxValue)
      .collect()
    assert(hi.length == 60 && hi.forall(_.getAs[String]("lang_id") == "unknown"))
    // NULL ids never emit (the q164 act convention)
    val withNullId = bilingual.withColumn("doc_id",
      when(col("doc_id") === 1L, lit(null).cast("long"))
        .otherwise(col("doc_id")))
    assert(LangId.applyLangId(withNullId).count() == 59L)
  }

  test("langIdOperatingPoints: monotone abstain sweep; the threshold buys accuracy when low margins are wrong") {
    // bilingual core + an ambiguous mixed-alphabet band labeled half
    // and half: identical text → ONE prediction → ~half the band is
    // wrong, and its margin sits far below the pure docs' — exactly
    // the regime the abstain knob exists for
    val docs = ((1 to 30).map(i => (i.toLong, "avava vavav aavva avvaa", "ava")) ++
      (31 to 60).map(i => (i.toLong, "ozozo zozoz oozzo ozzoo", "ozo")) ++
      (61 to 80).map(i => (i.toLong, "avava ozozo avoza ozava",
        if (i % 2 == 0) "ava" else "ozo")))
      .toDF("doc_id", "text", "lang")
    val sheet = LangId.langIdOperatingPoints(docs).collect()
      .sortBy(_.getAs[Long]("thr_q"))
    assert(sheet.nonEmpty)
    // every row splits the same held-out total
    val total = sheet.head.getAs[Long]("n_abstain") +
      sheet.head.getAs[Long]("n_scored")
    assert(total > 0 && sheet.forall(r =>
      r.getAs[Long]("n_abstain") + r.getAs[Long]("n_scored") == total))
    // abstain mass is monotone in the threshold
    val abst = sheet.map(_.getAs[Long]("n_abstain")).toSeq
    assert(abst == abst.sorted)
    // the sheet REWARDS the threshold here: the top band's accuracy
    // strictly beats the bottom's (the mixed band abstains out), and
    // the top band is pure
    assert(sheet.last.getAs[Double]("accuracy") >
      sheet.head.getAs[Double]("accuracy"))
    assert(sheet.last.getAs[Double]("accuracy") == 1.0)
    // abstain_rate is the exact division
    sheet.foreach { r =>
      assert(r.getAs[Double]("abstain_rate") ==
        r.getAs[Long]("n_abstain").toDouble / total)
    }
  }

  test("langDist monitors: identical distribution reads exactly 0; a language switch alerts; empty model never crashes") {
    val model = LangId.langIdModelRow(bilingual)
    val support = model.select(explode(col("classes")).as("predicted_lang"))
    // the monitor-deployment baseline (gate-kernel scored) equals the
    // persisted join-path artifact bitwise — the two scorers are
    // pinned arithmetic-identical, so the rollups must agree
    val dist = LangId.langDistRowOf(
      LangId.scoreAgainstModel(bilingual, model))
    val baseline = LangId.langDistBaseline(bilingual).collect().head
    val distRow = dist.collect().head
    assert(distRow.getAs[Map[String, Long]]("lmap") ==
      baseline.getAs[Map[String, Long]]("lmap") &&
      distRow.getAs[Long]("t_g") == baseline.getAs[Long]("t_g"),
      "gate-scored and join-scored baselines drifted")
    // a batch predicting EXACTLY the standing shares reads 0 — every
    // per-class delta cancels before quantization
    val same = LangId.langDistAgainst(
      LangId.scoreAgainstModel(bilingual, model), support, dist)
      .collect().head
    assert(same.getAs[Long]("n_docs") == 60L &&
      same.getAs[Long]("n_langs") == 2L)
    assert(same.getAs[Long]("kl_q") == 0L && same.getAs[Long]("alert") == 0L)
    // the feed switches language: all mass moves to one class — the
    // alarm a provenance label cannot raise fires
    val switched = bilingual.filter(col("lang") === "ozo")
    val sw = LangId.langDistAgainst(
      LangId.scoreAgainstModel(switched, model), support, dist)
      .collect().head
    assert(sw.getAs[Long]("n_langs") == 1L)
    assert(sw.getAs[Long]("kl_q") > 0L && sw.getAs[Long]("alert") == 1L,
      s"language switch must alert (kl_q = ${sw.getAs[Long]("kl_q")})")
    // empty (classless) model: one all-NULL row, alert 0 — the audit
    // signal to not arm the monitor, never a crash
    val noText = (1L to 6L).map(i => (i, null.asInstanceOf[String], "xx"))
      .toDF("doc_id", "text", "lang")
    val emptyModel = LangId.langIdModelRow(noText)
    val er = LangId.langDistAgainst(
      LangId.scoreAgainstModel(noText, emptyModel),
      emptyModel.select(explode(col("classes")).as("predicted_lang")),
      LangId.langDistRowOf(
        LangId.scoreAgainstModel(noText, emptyModel)))
      .collect()
    assert(er.length == 1 && er.head.isNullAt(er.head.fieldIndex("kl_q")) &&
      er.head.getAs[Long]("alert") == 0L)
  }

  test("langDistDriftBySource: per-source attribution partitions the one-row twin's mass") {
    val docs = ((1 to 30).map(i =>
      (i.toLong, "avava vavav aavva avvaa", "ava", "A")) ++
      (31 to 60).map(i =>
        (i.toLong, "ozozo zozoz oozzo ozzoo", "ozo", "B")))
      .toDF("doc_id", "text", "lang", "source")
    val rows = LangId.langDistDriftBySource(docs, newPermille = 300)
      .collect()
    val one = LangId.langDistDrift(docs, newPermille = 300).collect().head
    assert(rows.nonEmpty && one.getAs[Long]("n_docs") > 0L)
    // the sheet partitions exactly the arrival mass the one-row twin
    // reads — same split, same scorer, no doc lost or double-counted
    assert(rows.map(_.getAs[Long]("n_docs")).sum == one.getAs[Long]("n_docs"))
    // a single-language feed concentrates all its arrival mass on one
    // class: one predicted lang, positive KL against the balanced
    // standing corpus — the per-feed blame the aggregate can't assign
    rows.foreach { r =>
      assert(r.getAs[Long]("n_langs") == 1L,
        s"source ${r.getAs[String]("source")} not single-language")
      assert(r.getAs[Long]("kl_q") > 0L,
        s"source ${r.getAs[String]("source")} read zero KL")
    }
    // pure function of the data
    val re = LangId.langDistDriftBySource(docs.repartition(7),
      newPermille = 300).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("kl_q"))).toSet
    assert(re == rows.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("kl_q"))).toSet)
  }

  test("empty batch reads (0, 0, NULL, 0) — a no-data micro-batch never raises the language alarm") {
    val model = LangId.langIdModelRow(bilingual)
    val support = model.select(explode(col("classes")).as("predicted_lang"))
    val dist = LangId.langDistBaseline(bilingual)
    // with t_b = 0 the +1 smoothing would read the batch as uniform
    // and KL(uniform ‖ standing) clears any alert line on a skewed
    // baseline — the guard must return the empty-support shape instead
    val r = LangId.langDistAgainst(
      LangId.scoreAgainstModel(bilingual.filter(col("doc_id") < 0L), model),
      support, dist).collect().head
    assert(r.getAs[Long]("n_docs") == 0L && r.getAs[Long]("n_langs") == 0L)
    assert(r.isNullAt(r.fieldIndex("kl_q")) && r.getAs[Long]("alert") == 0L)
  }

  test("the model row persists its bucket count; a mismatched caller fails loudly") {
    val model = LangId.langIdModelRow(bilingual, buckets = 4096)
    assert(model.collect().head.getAs[Long]("buckets") == 4096L)
    // a matching caller scores normally (and bitwise the 4096 batch
    // sheet — same modulus on both sides)
    assert(LangId.scoreAgainstModel(bilingual, model, buckets = 4096)
      .count() == 60L)
    // the default-buckets caller against a 4096 model must raise, not
    // silently hash into the wrong dense-array cells
    val ex = intercept[Exception] {
      LangId.scoreAgainstModel(bilingual, model).collect()
    }
    assert(ex.getMessage != null)
  }

  test("incremental model fold is exact: the patched artifact predicts bitwise the retrained one") {
    // a batch carrying more of a standing class AND an entirely NEW
    // class — additive counts must handle both without retrain
    val batch = (
      (61 to 70).map(i => (i.toLong, "avava vavav aavva", "ava")) ++
      (71 to 82).map(i => (i.toLong, "ululu lulul uullu ulluu", "ulu"))
    ).toDF("doc_id", "text", "lang")
    val union = bilingual.unionByName(batch)
    val patched = LangId.langIdModelRowIncrement(bilingual, batch)
    val retrained = LangId.langIdModelRow(union)
    def preds(model: org.apache.spark.sql.DataFrame) =
      LangId.scoreAgainstModel(union, model)
        .select("doc_id", "n_grams", "predicted_lang", "margin_q")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
          r.getAs[String]("predicted_lang"), r.getAs[Long]("margin_q"))).toSet
    assert(preds(patched) == preds(retrained),
      "patched gate must predict bitwise the retrained gate")
    assert(patched.collect().head.getSeq[String](
        patched.schema.fieldIndex("classes")).contains("ulu"),
      "the batch-only class enters the patched artifact")

    // relational degeneracy: folding an EMPTY batch is the monolithic
    // sheet — and the monolithic sheet over the union equals the fold
    val empty = batch.filter(col("doc_id") < 0L)
    def sheet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("cls"),
        Option(r.get(r.fieldIndex("b"))), r.getAs[Long]("cnt"),
        r.getAs[Long]("lg_q"), r.getAs[Long]("n_c"), r.getAs[Long]("t_c"),
        r.getAs[Long]("prior_q"), r.getAs[Long]("tlog_q"))).toSet
    assert(sheet(LangId.langIdModelIncrement(bilingual, batch)) ==
      sheet(LangId.langIdModelIncrement(union, empty)),
      "standing+batch fold == monolithic fold with an empty batch")
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
