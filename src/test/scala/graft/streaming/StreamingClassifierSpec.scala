package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{Classifier, Sampling}

/** The quality family's SUPERVISED streaming twin (q143 at INGEST):
  * with the trained NB model broadcast as one static row
  * ([[Classifier.nbModelRow]]), [[Curation.classifierGate]] is a
  * stateless map-side fold — and the held-out corpus streamed through
  * the gate must reproduce the batch sheet
  * ([[Classifier.nbQualityScores]]) bitwise: every
  * (doc_id, n_bigrams, score_q, predicted) row. */
class StreamingClassifierSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fixture: Seq[(Long, Option[String], String)] = {
    val a = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val b = Seq("omega", "sigma", "theta", "lambda", "kappa")
    (0L until 240L).map { i =>
      val v = if (i % 2 == 0) a else b
      val words = (0 until 12).map(j => v((i + j).toInt % v.size))
      (i, Some(words.mkString(" ")), if (i % 2 == 0) "good" else "bad")
    } ++ Seq(
      (1000L, None, "bad"),
      (1001L, Some("solo"), "good"),
      (1002L, Some("zzz yyy xxx"), "bad"))
  }

  test("stream-gated scores and decisions equal the q143 batch sheet bitwise") {
    val docs = fixture.toDF("doc_id", "text", "source")
    val positive = col("source") === "good"

    val batch = Classifier.nbQualityScores(docs, positive)
      .select("doc_id", "n_bigrams", "score_q", "predicted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(batch.nonEmpty)
    assert(batch.map(_._4).contains(0L) && batch.map(_._4).contains(1L),
      "fixture must exercise both decisions")

    // static state, trained once on the standing labeled corpus
    val model = Classifier.nbModelRow(docs, positive)

    // the gate scores ARRIVALS: stream exactly the held-out split the
    // batch sheet covers
    val heldOutIds = Sampling.withSplitBucket(docs, "doc_id")
      .filter(col("__bucket") >= 500).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val heldOut = fixture.filter(t => heldOutIds(t._1))

    val stream = MemoryStream[(Long, Option[String], String)](spark)
    val gated = Curation.classifierGate(
      stream.toDF().toDF("doc_id", "text", "source"), model)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("clf_gate").start()
    try {
      stream.addData(heldOut.take(60): _*); q.processAllAvailable()
      stream.addData(heldOut.drop(60): _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("clf_gate")
      .select("doc_id", "n_bigrams", "score_q", "predicted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed == batch,
      s"stream minus batch: ${streamed -- batch}; batch minus stream: ${batch -- streamed}")
  }

  test("the gate is total on degenerate arrivals: null text and OOV score prior-only shapes") {
    val docs = fixture.toDF("doc_id", "text", "source")
    val model = Classifier.nbModelRow(docs, col("source") === "good")
    val stream = MemoryStream[(Long, Option[String], String)](spark)
    val gated = Curation.classifierGate(
      stream.toDF().toDF("doc_id", "text", "source"), model)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("clf_gate_edge").start()
    try {
      stream.addData((5000L, None, "x"), (5001L, Some(""), "x"),
        (5002L, Some("totally unseen vocabulary here"), "x"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("clf_gate_edge")
      .select("doc_id", "n_bigrams", "score_q").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(5000L)._1 == 0L, "null text carries no bigrams")
    // unseen buckets contribute 0: the OOV doc's score differs from
    // prior-only EXACTLY by n_bigrams * k_q
    val kq = (rows(5002L)._2 - rows(5000L)._2) / rows(5002L)._1
    assert(rows(5002L)._2 == rows(5000L)._2 + rows(5002L)._1 * kq)
  }
}
