package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{ConnectedComponents, Dedup}
import graft.sinks.UpsertWriter

/** The streaming CAPSTONE — q71's claim ("the shipped operators chain
  * without recompute") proven across the batch/stream boundary: the
  * same kernels, composed as an ingest pipeline
  *
  *   MemoryStream → [[Curation.ingestGate]] (map-side quality rules +
  *   watermarked dedup) → foreachBatch incremental near-dup dedup
  *   against the STANDING table ([[Dedup.crossNearDupPairs]], the q68
  *   kernel) → [[UpsertWriter.upsert]]
  *
  * must land the exact keep-set the batch composition (q81-style gate →
  * q28 pair graph → q58/q59 canonical keep-set) computes over the whole
  * fixture at once. Greedy arrival-order keeping equals the batch
  * min-id rule because the fixture's near-dup pairs span micro-batches
  * with ids increasing in arrival order — the same equivalence a
  * production backfill relies on when replaying history into an
  * incremental pipeline. */
case class CapstoneDoc(ts: Timestamp, doc_id: Long, lang: String, text: String)

class StreamingCapstoneSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def d(id: Long, lang: String, text: String) = CapstoneDoc(t0, id, lang, text)

  private val textA = "the quick brown fox jumps over the lazy dog in a cold morning sun"
  private val textB = "a gentle river flows past the old mill and under a stone bridge today"
  private val textC = "many hands make light work for the whole team in a good long day"

  private val batch1 = Seq(
    d(1L, "en", textA),
    d(2L, "en", textB),
    d(3L, "en", "the fox"),                                          // too_short
    d(4L, "de", "der schnelle braune fuchs springt über den hund"),  // non_english
    d(5L, "en", "zz yy xx ww vv uu tt ss rr qq"),                    // low_stopword
    d(6L, "en", textC))
  private val batch2 = Seq(
    d(11L, "en", textA + " indeed"),   // near-dup of standing doc 1
    d(12L, "en", "fresh snow covers the quiet village while children play beside a frozen lake"),
    d(13L, "en", textB + " tomorrow"), // near-dup of standing doc 2
    d(14L, "en", textC))               // exact content of standing doc 6, new id

  test("stream (gate → foreachBatch incremental dedup → upsert) equals the batch keep-set") {
    val tableDir = java.nio.file.Files.createTempDirectory("graft_capstone").toString + "/table"
    val keys = UpsertWriter.Keys(recordKey = "doc_id", precombine = "ts", partition = "lang")
    implicit val enc = org.apache.spark.sql.Encoders.product[CapstoneDoc]
    val stream = MemoryStream[CapstoneDoc](spark)
    val gated = Curation.ingestGate(stream.toDF(), "ts", "10 minutes",
      keys = Seq("doc_id"), minTokens = 5, stopwordPct = 10)
    val q = gated.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // incremental near-dup stage: the q68 kernel against what the
        // table already kept; first batch has no standing side
        val dir = new java.io.File(tableDir)
        val hasTable = dir.exists && dir.listFiles != null &&
          dir.listFiles.exists(_.getName.startsWith("lang="))
        val keep = if (hasTable) {
          val standing = UpsertWriter.readTable(spark, tableDir)
            .select("ts", "doc_id", "lang", "text")
          val flagged = standing.withColumn("is_new", lit(false)).unionByName(
            batch.select("ts", "doc_id", "lang", "text").withColumn("is_new", lit(true)))
          val dupNew = Dedup.crossNearDupPairs(flagged, "is_new")
            .select(col("new_id").as("doc_id")).distinct()
          batch.join(dupNew, Seq("doc_id"), "left_anti")
        } else batch
        UpsertWriter.upsert(keep, tableDir, keys)
      }.start()
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamedKeep = UpsertWriter.readTable(spark, tableDir)
      .select("doc_id").as[Long].collect().toSet

    // batch twin: the same kernels composed once over the full fixture
    val all = (batch1 ++ batch2).toDF()
    val quality = Curation.keepByQuality(all, minTokens = 5, stopwordPct = 10)
    val pairs = Dedup.nearDupPairs(quality.select(col("doc_id"), col("text")))
    val batchKeep = ConnectedComponents
      .keepCanonical(quality, "doc_id", pairs.select("a_id", "b_id"))
      .select("doc_id").as[Long].collect().toSet

    assert(streamedKeep == batchKeep,
      s"stream kept $streamedKeep, batch twin kept $batchKeep")
    assert(streamedKeep == Set(1L, 2L, 6L, 12L))
  }
}
