package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark
import graft.functions.TextFunctions

/** Curation at INGEST: the map-side quality rules (q74's too_short /
  * non_english / low_stopword — everything that needs no corpus-level
  * aggregation) plus bounded-state exact dedup, composed into one
  * Structured Streaming pipeline over a MemoryStream, with the same
  * filter applied in batch as the parity oracle. The corpus-level
  * repetition rules (top token/bigram mass) are deliberately absent:
  * they aggregate across a doc's full term distribution, which IS
  * map-side per doc, but the q72 thresholds belong to a corpus audit
  * pass, not an ingest gate. */
case class CurationDoc(ts: Timestamp, doc_id: Long, lang: String, text: String)

class StreamingCurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def keepRules(df: org.apache.spark.sql.DataFrame) = {
    val withStats = df
      .withColumn("toks", TextFunctions.rawTokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_cnt", TextFunctions.stopwordCount(col("text")))
    withStats
      .filter(col("n_tokens") >= 5)
      .filter(col("lang") === "en")
      .filter(lit(10) * col("stop_cnt") >= col("n_tokens"))
      .select("doc_id", "lang", "text")
  }

  test("map-side filter rules + watermarked dedup run in a stream and match batch") {
    implicit val enc = org.apache.spark.sql.Encoders.product[CurationDoc]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = Seq(
      CurationDoc(t0, 1L, "en", "the quick brown fox and the lazy dog of the farm"),
      CurationDoc(t0, 1L, "en", "the quick brown fox and the lazy dog of the farm"), // dup id
      CurationDoc(t0, 2L, "en", "too short"),                                        // < 5 tokens
      CurationDoc(t0, 3L, "de", "der schnelle braune fuchs und der faule hund"),     // non-en
      CurationDoc(t0, 4L, "en", "zz yy xx ww vv uu tt ss"),                          // no stopwords
      CurationDoc(t0, 5L, "en", "a walk in the park is good for the soul"))
    val stream = MemoryStream[CurationDoc](spark)
    val piped = keepRules(
      StreamingDedup.dedupWithinWatermark(stream.toDF(), "ts", "10 minutes", Seq("doc_id")))
    val q = piped.writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("curated").select("doc_id").as[Long].collect().sorted.toSeq
      val batch = keepRules(docs.toDF().dropDuplicates("doc_id"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch)
      assert(streamed == Seq(1L, 5L)) // dup suppressed once, 3 reasons drop
    } finally q.stop()
  }
}
