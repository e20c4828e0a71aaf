package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.LangId

/** The q181 language identifier's streaming twin: with the standing
  * one-row lang-ID artifact broadcast, [[Curation.langIdGate]] is a
  * stateless per-arrival scorer whose map-lookup folds replay the
  * batch NB arithmetic exactly. Pins: a streamed batch of the
  * held-out docs predicts BITWISE the q181 per-doc sheet (class,
  * margin, gram count); degenerate arrivals (null text, short text,
  * unseen trigrams) score prior-only or via zero contributions and
  * never crash; an empty (classless) model predicts NULL for every
  * arrival. */
class StreamingLangIdGateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // bilingual fixture with disjoint alphabets (the LangIdSpec corpus)
  private def fixture: Seq[(Long, String, String)] =
    (1L to 30L).map(i => (i, "avava vavav aavva avvaa", "ava")) ++
      (31L to 60L).map(i => (i, "ozozo zozoz oozzo ozzoo", "ozo"))

  test("streamed gate predicts bitwise the batch held-out sheet") {
    val docs = fixture.toDF("doc_id", "text", "lang")
    val model = LangId.langIdModelRow(docs)
    val batch = LangId.langIdScores(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[String]("predicted_lang"), r.getAs[Long]("margin_q"))).toSet
    assert(batch.nonEmpty)
    val heldOutIds = batch.map(_._1)

    val results = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, String, Long)]]
    val stream = MemoryStream[(Long, String, String)](spark)
    val q = stream.toDF().toDF("doc_id", "text", "lang")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          results += Curation.langIdGate(b, model)
            .select("doc_id", "n_grams", "predicted_lang", "margin_q")
            .collect()
            .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
              r.getAs[String]("predicted_lang"),
              r.getAs[Long]("margin_q"))).toSet
        ()
      }
      .start()
    try {
      // feed exactly the docs the batch sheet held out
      stream.addData(fixture.filter(d => heldOutIds.contains(d._1)): _*)
      q.processAllAvailable()
      assert(results.nonEmpty && results.head == batch,
        "streamed predictions != batch held-out sheet")

      // degenerate arrivals: null text scores prior-only; text shorter
      // than a trigram likewise; unseen trigrams contribute 0 — all
      // pass with a non-null prediction, never crash
      results.clear()
      stream.addData((9001L, null.asInstanceOf[String], "x"),
        (9002L, "ab", "x"), (9003L, "qqqqq wwwww", "x"))
      q.processAllAvailable()
      val deg = results.flatten.map(r => r._1 -> ((r._2, r._3))).toMap
      assert(deg(9001L)._1 == 0L && deg(9002L)._1 == 0L)
      assert(Seq(9001L, 9002L, 9003L).forall(id =>
        Set("ava", "ozo").contains(deg(id)._2)))
    } finally q.stop()
  }

  test("streamed langDistMonitor reads bitwise the q188 batch sheet") {
    val docs = fixture.toDF("doc_id", "text", "lang")
    // the batch twin's one-row sheet at a 30% arrival slice
    val batchRow = LangId.langDistDrift(docs, newPermille = 300).collect().head
    assert(batchRow.getAs[Long]("n_docs") > 0L, "fixture must yield arrivals")
    def tup(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
        r.getAs[Long]("kl_q"), r.getAs[Long]("alert"))

    // rebuild the standing artifacts exactly as a deployment persists
    // them: the model row + the join-path baseline
    val flagged = graft.operators.Sampling.withSplitBucket(
      docs, "doc_id", "arrivals")
    val standing = flagged.filter(col("__bucket") >= 300).drop("__bucket")
    val incomingIds = flagged.filter(col("__bucket") < 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val model = LangId.langIdModelRow(standing)
    val dist = LangId.langDistBaseline(standing)

    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    val stream = MemoryStream[(Long, String, String)](spark)
    val q = stream.toDF().toDF("doc_id", "text", "lang")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          results += tup(
            Curation.langDistMonitor(b, model, dist).collect().head)
        ()
      }
      .start()
    try {
      stream.addData(fixture.filter(d => incomingIds.contains(d._1)): _*)
      q.processAllAvailable()
      assert(results.nonEmpty && results.head == tup(batchRow),
        s"streamed monitor ${results.headOption} != batch sheet ${tup(batchRow)}")
    } finally q.stop()
  }

  test("an empty (classless) model predicts NULL and never crashes") {
    val noText = (1L to 6L).map(i => (i, null.asInstanceOf[String], "xx"))
      .toDF("doc_id", "text", "lang")
    val emptyModel = LangId.langIdModelRow(noText)
    assert(emptyModel.count() == 1L)

    val results = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Boolean)]]
    val stream = MemoryStream[(Long, String, String)](spark)
    val q = stream.toDF().toDF("doc_id", "text", "lang")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          results += Curation.langIdGate(b, emptyModel).collect().toSeq
            .map(r => (r.getAs[Long]("doc_id"),
              r.isNullAt(r.fieldIndex("predicted_lang"))))
        ()
      }
      .start()
    try {
      stream.addData((1L, "avava vavav", "ava"))
      q.processAllAvailable()
      assert(results.flatten == Seq((1L, true)),
        "classless model must pass the row with a NULL prediction")
    } finally q.stop()
  }
}
