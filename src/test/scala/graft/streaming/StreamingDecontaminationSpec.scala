package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{Decontaminate, Sampling}

/** The decontamination family's streaming twin (the q116 probe at
  * INGEST): the eval split's Bloom filter is static and tiny, so
  * [[Curation.decontaminationGate]] is a stateless map-side probe —
  * and the SAME fixture streamed through the gate must flag exactly
  * the candidate set the batch probe
  * ([[Decontaminate.bloomContaminationCandidates]]) reports, down to
  * the per-doc shingle/candidate counts. */
class StreamingDecontaminationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ~half the docs carry a shared 12-token boilerplate run (≥ 10 shared
  // shingles — far past minOverlap); split membership is md5-determined
  // per doc_id — for ids 1..60 at the default salt the eval split is
  // {17, 21}, both odd — so planting the phrase on ODD ids puts
  // carriers in the eval split and every odd train doc becomes a
  // planted contamination hit (the nonEmpty assert guards the fixture
  // against a salt change).
  private val phrase =
    "all rights reserved redistribution permitted provided this notice stays intact verbatim"
  private def fixture: Seq[(Long, String)] = (1L to 60L).map { i =>
    val filler = (0 until 14).map(j => s"tok${i}x$j").mkString(" ")
    val text = if (i % 2 == 1) s"$filler $phrase" else s"$filler extra tail tokens here"
    (i, text)
  }

  test("stream-gated candidates equal the q116 batch candidate set") {
    val docs = fixture.toDF("doc_id", "text")

    val batchFlagged = Decontaminate.bloomContaminationCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchFlagged.nonEmpty, "fixture must plant at least one contamination hit")

    // the static side: ONE Bloom mask row built from the same corpus
    val mask = Decontaminate.bloomEvalMask(docs)
    // the streaming side: only the TRAIN docs arrive at ingest
    val trainDocs = Sampling.withSplitBucket(docs, "doc_id")
      .filter(col("__bucket") >= 100).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val stream = MemoryStream[(Long, String)](spark)
    val gated = Curation.decontaminationGate(
      stream.toDF().toDF("doc_id", "text"), mask)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("decon_gate").start()
    try {
      // two micro-batches: the gate is stateless, so batching is irrelevant
      stream.addData(trainDocs.take(20): _*); q.processAllAvailable()
      stream.addData(trainDocs.drop(20): _*); q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("decon_gate")
    assert(out.count() == trainDocs.length, "the gate drops nothing; it flags")
    val streamFlagged = out.filter(col("contaminated"))
      .select("doc_id", "n_shingles", "n_candidates")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamFlagged == batchFlagged,
      s"stream flagged $streamFlagged, batch probe flagged $batchFlagged")

    // unflagged rows still carry sound counts: below threshold, bounded
    out.filter(!col("contaminated")).collect().foreach { r =>
      assert(r.getAs[Long]("n_candidates") < 3L)
      assert(r.getAs[Long]("n_candidates") <= r.getAs[Long]("n_shingles"))
    }
  }

  test("gate is total on null text and empty mask flags nothing") {
    val empty = Decontaminate.bloomEvalMask(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val stream = MemoryStream[(Long, String)](spark)
    val gated = Curation.decontaminationGate(
      stream.toDF().toDF("doc_id", "text")
        .withColumn("text", when(col("doc_id") === 2L, lit(null: String))
          .otherwise(col("text"))), empty)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("decon_gate_null").start()
    try {
      stream.addData((1L, "plain text with several tokens inside"), (2L, "ignored"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("decon_gate_null")
      .select("doc_id", "n_shingles", "n_candidates", "contaminated")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows(1L)._1 > 0L && rows(1L)._2 == 0L && !rows(1L)._3)
    assert(rows(2L) == ((0L, 0L, false)))
  }
}
