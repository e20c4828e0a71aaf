package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Phrases

/** The quality family's streaming twin (q125 at INGEST): with the
  * unigram cost map and the standing corpus's ppl cuts broadcast as
  * static one-row frames, [[Curation.lmQualityGate]] is a stateless
  * map-side fold — and the SAME corpus streamed through the gate must
  * reproduce the batch sheet ([[Phrases.lmQualityBuckets]]) bitwise:
  * every (doc_id, n_pieces, cost_q, ppl_q, bucket) row. */
class StreamingLmQualitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // mixed-quality fixture: repetitive low-cost docs, mid docs, and
  // high-entropy token soup, plus null/empty degenerates
  private def fixture: Seq[(Long, Option[String])] =
    (1L to 30L).map { i =>
      val text =
        if (i % 10 == 0) None
        else if (i % 3 == 0) Some(Seq.fill(12)("the common phrase repeats").mkString(" "))
        else if (i % 3 == 1) Some((0 until 20).map(j => s"word${(i + j) % 7}").mkString(" "))
        else Some((0 until 20).map(j => s"zq${i}x$j").mkString(" "))
      (i, text)
    } :+ ((31L, Some("")))

  test("stream-gated buckets equal the q125 batch sheet bitwise") {
    val docs = fixture.toDF("doc_id", "text")

    val batch = Phrases.lmQualityBuckets(docs, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    assert(batch.map(_._5).intersect(Set("head", "middle", "tail", "empty")).size == 4,
      "fixture must exercise every bucket")

    // static state, built once from the standing corpus
    val model = Phrases.unigramCostMap(docs, "text")
    val cuts = Phrases.lmQualityCuts(docs, "text")

    val stream = MemoryStream[(Long, Option[String])](spark)
    val gated = Curation.lmQualityGate(
      stream.toDF().toDF("doc_id", "text"), model, cuts)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("lm_gate").start()
    try {
      val rows = fixture
      stream.addData(rows.take(15): _*); q.processAllAvailable()
      stream.addData(rows.drop(15): _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("lm_gate")
      .select("doc_id", "n_pieces", "cost_q", "ppl_q", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    assert(streamed == batch,
      s"stream minus batch: ${streamed -- batch}; batch minus stream: ${batch -- streamed}")
  }

  test("gate is total on OOV ingest: characters absent from the standing corpus") {
    // The gate's whole point is applying a STANDING model to NEW data —
    // whose characters the standing corpus may never have seen. Every
    // Viterbi candidate for an OOV position goes NULL without the UNK
    // fallback; the empty candidate list then aborts the streaming
    // query (element_at on an empty array). With the fallback, OOV
    // characters cost UnkCost (worse than any in-vocab piece), the DP
    // stays total, and OOV-heavy garbage lands in 'tail' — never 'head'.
    val standing = (1L to 20L).map { i =>
      (i, Some((0 until 20).map(j => s"alpha${(i + j) % 5} beta${j % 3}").mkString(" ")))
    }.toDF("doc_id", "text")
    val model = Phrases.unigramCostMap(standing, "text")
    val cuts = Phrases.lmQualityCuts(standing, "text")

    val stream = MemoryStream[(Long, Option[String])](spark)
    val gated = Curation.lmQualityGate(
      stream.toDF().toDF("doc_id", "text"), model, cuts)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("lm_gate_oov").start()
    try {
      stream.addData(
        (1L, Some("alpha1 beta2 alpha3")),              // fully in-vocab
        (2L, Some("zrc ürïcö ÿq 漢字")),                 // every char OOV (corpus = a,l,p,h,b,e,t + digits)
        (3L, Some("alpha1 qqq~!@# beta2")),             // mixed in/out of vocab
        (4L, None))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("lm_gate_oov")
      .select("doc_id", "n_pieces", "ppl_q", "bucket")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows.size == 4, "the gate must emit every row — OOV input cannot kill the query")
    assert(rows(4L)._3 == "empty")
    assert(rows(1L)._1 > 0 && rows(1L)._3 != "empty")
    // every character OOV: each costs UnkCost=30 per piece, so
    // ppl_q = 30·2^20 — above any in-vocab piece cost (≤ 21), hence
    // above both cuts of the standing corpus: 'tail', never 'head'
    assert(rows(2L)._1 > 0, "OOV text must still segment (UNK singles)")
    assert(rows(2L)._2 == 30L * 1048576L, s"pure-OOV ppl must be UnkCost·2^20: ${rows(2L)}")
    assert(rows(2L)._3 == "tail", s"OOV garbage must not be labeled clean: ${rows(2L)}")
    assert(rows(3L)._1 > 0 && rows(3L)._3 != "empty")
  }

  test("gate is total: null cuts (empty standing corpus) and null text never throw") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val model = Phrases.unigramCostMap(empty, "text")
    val cuts = Phrases.lmQualityCuts(empty, "text")
    val stream = MemoryStream[(Long, Option[String])](spark)
    val gated = Curation.lmQualityGate(
      stream.toDF().toDF("doc_id", "text"), model, cuts)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("lm_gate_degenerate").start()
    try {
      stream.addData((1L, Some("some words here")), (2L, None))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("lm_gate_degenerate")
      .select("doc_id", "n_pieces", "bucket")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // an empty model still segments (no pieces in map → no candidates →
    // ... the all-singles guarantee needs a corpus; with an EMPTY map the
    // l=1 candidate costs NULL and is filtered, so the fold must still
    // terminate: the sorted candidate list is empty and element_at
    // yields a NULL best → NULL budget → zeros, bucket 'empty'
    assert(rows(1L) == ((0L, "empty")))
    assert(rows(2L) == ((0L, "empty")))
  }
}
