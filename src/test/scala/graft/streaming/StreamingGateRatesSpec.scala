package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{Classifier, Ensemble, Phrases, Sampling}

/** The per-source ablation's streaming twin (q153 at INGEST): with the
  * three standing models broadcast — the unigram cost map + cuts, the
  * NB model row, and the (stateless) rule kernel — a micro-batch
  * carrying exactly the held-out slice must reproduce the q153 batch
  * sheet bitwise through [[Curation.gateRatesMonitor]]: same kill
  * decisions per family (each already pinned by its own streaming
  * spec), same single-sourced rollup, same exact fixed-point rates. */
class StreamingGateRatesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // (doc_id, text, lang, source): 'good' = stopword-rich varied prose;
  // 'bad' = repetitive spam, too-short stubs, token soup (some
  // non-English) — so every family kills something, somewhere
  private def fixture: Seq[(Long, Option[String], String, String)] =
    (1L to 120L).map { i =>
      val (text, lang, src) =
        if (i % 2 == 0)
          ((0 until 40).map(j => s"the of and a word${(i + j) % 37} text$j")
            .mkString(" "), "en", "good")
        else if (i % 4 == 1)
          (Seq.fill(30)("spam spam wonderful spam").mkString(" "), "en", "bad")
        else if (i % 8 == 3) ("short", "en", "bad")
        else ((0 until 25).map(j => s"qq${i}z$j").mkString(" "),
          if (i % 3 == 0) "de" else "en", "bad")
      (i, Option(text), lang, src)
    } :+ ((121L, Option.empty[String], "en", "bad"))

  private def sheet(df: DataFrame) = df
    .select("source", "n", "n_rules", "n_lm", "n_nb",
      "rate_rules_q", "rate_lm_q", "rate_nb_q")
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    .toSet

  test("a full held-out micro-batch reproduces the q153 batch sheet bitwise") {
    val docs = fixture.toDF("doc_id", "text", "lang", "source")
    val positive = col("source") === "good"

    val batchSheet = sheet(Ensemble.gateRatesBySource(docs, positive))
    assert(batchSheet.map(_._1) == Set("good", "bad"))
    assert(batchSheet.exists(r => r._3 > 0), "the rule family must kill somewhere")
    assert(batchSheet.exists(r => r._5 > 0), "the NB family must kill somewhere")

    // static state, built once from the standing labeled corpus —
    // exactly the models the batch kill frame derives internally
    val lmModel = Phrases.unigramCostMap(docs, "text")
    val lmCuts = Phrases.lmQualityCuts(docs, "text")
    val nbModel = Classifier.nbModelRow(docs, positive)

    // the monitor scores ARRIVALS: stream exactly the held-out split
    // the batch sheet covers, in ONE micro-batch (its comparison unit)
    val heldOutIds = Sampling.withSplitBucket(docs, "doc_id")
      .filter(col("__bucket") >= 500).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val heldOut = fixture.filter(t => heldOutIds(t._1))
    assert(heldOut.nonEmpty)

    val results = scala.collection.mutable.ArrayBuffer
      .empty[Set[(String, Long, Long, Long, Long, Long, Long, Long)]]
    val stream = MemoryStream[(Long, Option[String], String, String)](spark)
    val q = stream.toDF().toDF("doc_id", "text", "lang", "source").writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          results += sheet(Curation.gateRatesMonitor(b, lmModel, lmCuts, nbModel))
        ()
      }
      .start()
    try {
      stream.addData(heldOut: _*); q.processAllAvailable()
      // a second, deliberately tiny batch from an unseen feed: its own
      // independent sheet — per-batch rate semantics, no carried state
      stream.addData(
        (9001L, Option(Seq.fill(30)("junk junk junk junk").mkString(" ")),
          "en", "driftfeed"))
      q.processAllAvailable()
    } finally q.stop()

    assert(results.length == 2)
    assert(results.head == batchSheet,
      s"stream minus batch: ${results.head -- batchSheet}; " +
        s"batch minus stream: ${batchSheet -- results.head}")
    val second = results(1)
    assert(second.map(_._1) == Set("driftfeed"), "its own unit, its own sources")
    val r = second.head
    assert(r._2 == 1L && r._3 == 1L,
      "the 4-token-run spam must die by the rule family")
    assert(r._6 == 1048576L, "a 1-doc all-kill feed reads rate exactly 2^20")
  }
}
