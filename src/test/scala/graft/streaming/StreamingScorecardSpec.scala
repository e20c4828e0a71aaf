package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{Classifier, Drift, Mixing, Phrases, Similarity}

/** The acquisition capstone's streaming twin (q159's sheet shape at
  * INGEST): with the four standing model families broadcast — unigram
  * cost map + cuts and the NB row (gates), the PSI decile row, the
  * content-KL bucket row, and the ANN centroid + kept-index rows —
  * [[Curation.scorecardMonitor]] is a stateless per-batch composition.
  * Pins, all bitwise on the same fixture: (1) a streamed micro-batch's
  * sheet equals the monitor called directly on the batch frame;
  * (2) the KL column equals q155's sourceKlDivergence when the model
  * is the batch corpus's own (the klPerSourceClose single-sourcing);
  * (3) the PSI columns equal q156's lengthPsiBySource likewise;
  * (4) gate and dup columns equal their member monitors' sheets. */
class StreamingScorecardSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // (doc_id, text, lang, source, embedding): 'good' = stopword-rich
  // prose on one embedding direction; 'spamfeed' = repetitive spam
  // near the standing kept vector (the ANN gate vetoes it); 'soup' =
  // token soup off on its own direction.
  private def fixture: Seq[(Long, Option[String], String, String, Array[Float])] =
    (1L to 90L).map { i =>
      if (i % 3 == 0)
        (i, Option((0 until 40).map(j => s"the of and a word${(i + j) % 37} text$j")
          .mkString(" ")), "en", "good", Array(1f, 0.1f * (i % 5), 0f))
      else if (i % 3 == 1)
        (i, Option(Seq.fill(30)("spam spam wonderful spam").mkString(" ")),
          "en", "spamfeed", Array(0f, 1f, 0.01f * (i % 3)))
      else
        (i, Option((0 until 25).map(j => s"qq${i}z$j").mkString(" ")),
          "en", "soup", Array(0f, 0.05f * (i % 4), 1f))
    }

  private def sheet(df: DataFrame) = df.collect().map { r =>
    def g(c: String): Any =
      if (r.isNullAt(r.fieldIndex(c))) null else r.get(r.fieldIndex(c))
    (r.getString(0), g("n_docs"), g("dup_rate_q"), g("n_gated"),
      g("rate_rules_q"), g("rate_lm_q"), g("rate_nb_q"), g("kl_q"),
      g("psi_q"), g("psi_alert"), g("lang_kl_q"))
  }.toSet

  test("a streamed micro-batch reproduces the batch composition bitwise; members pin to q155/q156") {
    val docs = fixture.toDF("doc_id", "text", "lang", "source", "embedding")
    val textDocs = docs.select("doc_id", "text", "lang", "source")

    // standing models, built once from the corpus the batch will be
    // compared against
    val lmModel = Phrases.unigramCostMap(textDocs, "text")
    val lmCuts = Phrases.lmQualityCuts(textDocs, "text")
    val nbModel = Classifier.nbModelRow(textDocs, col("source") === "good")
    val psiModel = Drift.lengthPsiModel(docs.filter(col("doc_id").isNotNull), "text")
    val klModel = Drift.contentKlModel(docs, "text")
    val cents = Seq((0L, Array(0f, 1f, 0f)), (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val standing = Seq((500L, Array(0f, 1f, 0f))).toDF("vec_id", "embedding")
    val centRow = Similarity.annGateCentroids(cents, dim = 3)
    val keptRow = Similarity.annGateKeptIndex(standing, cents,
      threshold = 0.95, dim = 3)
    val langModel = graft.operators.LangId.langIdModelRow(textDocs)
    val langDist = graft.operators.LangId.langDistBaseline(textDocs)

    def monitor(b: DataFrame): DataFrame = Curation.scorecardMonitor(
      b, lmModel, lmCuts, nbModel, psiModel, klModel, langModel, langDist,
      centRow, keptRow, annThreshold = 0.95, dim = 3)

    val batchSheet = sheet(monitor(docs))
    assert(batchSheet.map(_._1) == Set("good", "spamfeed", "soup"))
    // the spam feed sits on the standing kept vector's direction: the
    // ANN member must read it as near-total dup mass
    val spam = batchSheet.find(_._1 == "spamfeed").get
    assert(spam._3.asInstanceOf[Long] > 900000L,
      s"spamfeed must read as dup mass at the ANN gate: $spam")
    val good = batchSheet.find(_._1 == "good").get
    assert(good._3.asInstanceOf[Long] == 0L, s"good is nowhere near standing: $good")

    // member pins: the model-seat per-source kernels equal the q155 /
    // q156 batch sheets when the model is the corpus's own
    val klStream = Drift.klBySourceAgainstModel(docs, klModel)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val klBatch = Mixing.sourceKlDivergence(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(klStream == klBatch, "klBySourceAgainstModel must be bitwise q155")
    val psiStream = Drift.psiBySourceAgainstModel(
        docs.filter(col("doc_id").isNotNull), psiModel)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val psiBatch = Drift.lengthPsiBySource(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(psiStream == psiBatch, "psiBySourceAgainstModel must be bitwise q156")
    // the language seat: the standing-artifact kernel equals the q193
    // batch sheet when the artifacts are the batch corpus's own (the
    // langKlBySourceClose single-sourcing, scored via the pinned gate
    // kernel)
    val langStream = graft.operators.LangId
      .langKlBySourceAgainstModel(docs, langModel, langDist)
      .collect().map(r => (r.getString(0),
        r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("n_langs")),
        r.getLong(r.fieldIndex("kl_q")))).toSet
    val langBatch = graft.operators.LangId.langKlBySource(textDocs)
      .collect().map(r => (r.getString(0),
        r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("n_langs")),
        r.getLong(r.fieldIndex("kl_q")))).toSet
    assert(langStream == langBatch,
      "langKlBySourceAgainstModel must be bitwise q193")

    // the streamed twin: one micro-batch carrying the whole fixture
    val results = scala.collection.mutable.ArrayBuffer
      .empty[Set[(String, Any, Any, Any, Any, Any, Any, Any, Any, Any, Any)]]
    val stream = MemoryStream[(Long, Option[String], String, String, Array[Float])](spark)
    val q = stream.toDF().toDF("doc_id", "text", "lang", "source", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) results += sheet(monitor(b))
        ()
      }
      .start()
    try {
      stream.addData(fixture: _*); q.processAllAvailable()
      // a second tiny batch from an unseen feed: its own unit
      stream.addData((9001L,
        Option(Seq.fill(30)("junk junk junk junk").mkString(" ")),
        "en", "driftfeed", Array(0f, 1f, 0f)))
      q.processAllAvailable()
    } finally q.stop()

    assert(results.length == 2)
    assert(results.head == batchSheet,
      s"stream minus batch: ${results.head -- batchSheet}; " +
        s"batch minus stream: ${batchSheet -- results.head}")
    val second = results(1)
    assert(second.map(_._1) == Set("driftfeed"), "per-batch unit, its own sources")
    val r = second.head
    assert(r._2 == 1L && r._3.asInstanceOf[Long] == 1048576L,
      "the one junk doc rides the standing kept direction: all-dup feed")
    assert(r._10.asInstanceOf[Long] == 1L,
      "a 30-token feed against a mixed-length standing profile must PSI-alert")
  }
}
