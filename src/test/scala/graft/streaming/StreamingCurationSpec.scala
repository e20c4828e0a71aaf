package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark

/** Curation at INGEST, now exercised through the shipped operator
  * ([[Curation.ingestGate]] — map-side quality rules + bounded-state
  * exact dedup): the same gate applied in batch
  * ([[Curation.keepByQuality]] + dropDuplicates, and the q81
  * [[Curation.batchAudit]] reason-coded twin) is the parity oracle.
  * The corpus-level repetition rules (top token/bigram mass) are
  * deliberately absent from the gate: they aggregate across a doc's
  * full term distribution — q72 thresholds belong to a corpus audit
  * pass, not an ingest gate. */
case class CurationDoc(ts: Timestamp, doc_id: Long, lang: String, text: String)

class StreamingCurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val docs = Seq(
    CurationDoc(t0, 1L, "en", "the quick brown fox and the lazy dog of the farm"),
    CurationDoc(t0, 1L, "en", "the quick brown fox and the lazy dog of the farm"), // dup id
    CurationDoc(t0, 2L, "en", "too short"),                                        // < 5 tokens
    CurationDoc(t0, 3L, "de", "der schnelle braune fuchs und der faule hund"),     // non-en
    CurationDoc(t0, 4L, "en", "zz yy xx ww vv uu tt ss"),                          // no stopwords
    CurationDoc(t0, 5L, "en", "a walk in the park is good for the soul"))

  test("ingestGate (rules + watermarked dedup) runs in a stream and matches batch") {
    implicit val enc = org.apache.spark.sql.Encoders.product[CurationDoc]
    val stream = MemoryStream[CurationDoc](spark)
    val piped = Curation.ingestGate(stream.toDF(), "ts", "10 minutes",
        keys = Seq("doc_id"), minTokens = 5, stopwordPct = 10)
      .select("doc_id", "lang", "text")
    val q = piped.writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("curated").select("doc_id").as[Long].collect().sorted.toSeq
      val batch = Curation.keepByQuality(docs.toDF().dropDuplicates("doc_id"),
          minTokens = 5, stopwordPct = 10)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch)
      assert(streamed == Seq(1L, 5L)) // dup suppressed once, 3 reasons drop
    } finally q.stop()
  }

  test("batchAudit reason codes mirror the gate and pin the min-id keeper") {
    // a table audit sees unique ids — the duplicate CONTENT arrives
    // under a different id (6L), the stream's same-key replay is the
    // previous test's concern
    val table = docs.distinct :+ CurationDoc(t0, 6L, "en", docs.head.text)
    val audit = Curation.batchAudit(table.toDF(), minTokens = 5, stopwordPct = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(audit == Map(
      1L -> "kept",        // min-id keeper of the shared content
      2L -> "too_short",
      3L -> "non_english",
      4L -> "low_stopword",
      5L -> "kept",
      6L -> "duplicate"))  // same content as 1L, larger id loses
    // parity: batchAudit's kept ids == the streaming gate's output set
    val kept = audit.collect { case (id, "kept") => id }.toSeq.sorted
    assert(kept == Seq(1L, 5L))
  }

  test("sourceAudit rolls the audit relation into (source, reason) cells") {
    // srcX: a kept doc, its copy under a larger id (duplicate), and a
    // short doc; srcY: a kept doc and a null-text doc (too_short with
    // the -1 sentinel — greatest(n_tokens, 0) must keep its token
    // mass at 0, not -1).
    val kept = "a walk in the park is good for the soul and the mind"
    val df = Seq(
      (1L, "en", Option(kept), "srcX"),
      (2L, "en", Option(kept), "srcX"),
      (3L, "en", Option("too short"), "srcX"),
      (4L, "en", Option("the cat and the dog sat by the warm fire all night"), "srcY"),
      (5L, "en", Option.empty[String], "srcY"))
      .toDF("doc_id", "lang", "text", "source")
    val cells = Curation.sourceAudit(df, minTokens = 5, stopwordPct = 10)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("reason")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(cells(("srcX", "kept")) == ((1L, 13L)))
    assert(cells(("srcX", "duplicate")) == ((1L, 13L)), "min-id keeper: id 2 loses")
    assert(cells(("srcX", "too_short")) == ((1L, 2L)))
    assert(cells(("srcY", "kept")) == ((1L, 12L)))
    assert(cells(("srcY", "too_short")) == ((1L, 0L)),
      "the null-text -1 sentinel clamps to 0 token mass")
    assert(cells.size == 5)
  }

  test("null text drops as too_short — the gate is total on null payloads") {
    val df = Seq((7L, "en", Option.empty[String]), (8L, "en", Option("a walk in the park is good for the soul")))
      .toDF("doc_id", "lang", "text")
    val audit = Curation.batchAudit(df, minTokens = 5, stopwordPct = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(audit == Map(7L -> "too_short", 8L -> "kept"))
    assert(Curation.keepByQuality(df, minTokens = 5, stopwordPct = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(8L))
  }
}
