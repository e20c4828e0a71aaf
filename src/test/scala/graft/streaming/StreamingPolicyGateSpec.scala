package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Ensemble

/** The q162 act's streaming twin: with the standing verdict sheet
  * broadcast, [[Curation.feedPolicyGate]] is a stateless per-batch
  * filter, single-sourced with the batch act through
  * [[Ensemble.actOnVerdicts]]. Pins: a streamed batch's kept ids
  * equal [[Ensemble.applyFeedPolicy]]'s on the same corpus; a feed
  * the standing sheet has never seen passes whole (the q162 NULL
  * rule at the door); a dropped feed's arrivals vanish. */
class StreamingPolicyGateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // the EnsembleSpec planted-mirror corpus: 100 distinct clean docs,
  // a 10-doc all-duplicates mirror feed
  private def tokens(i: Long) = (0 until 30).map(j => s"w${i}x$j").mkString(" ")
  private def fixture: Seq[(Long, String, String, String)] =
    (1L to 100L).map(i => (i, "the and is of " + tokens(i), "en", "clean")) ++
      (1L to 10L).map(i => (1000L + i, "the and is of " + tokens(i), "en", "mirror"))

  test("streamed gate keeps exactly the batch act's rows; unseen feeds pass") {
    val docs = fixture.toDF("doc_id", "text", "lang", "source")
    val pos = col("source") === "clean"

    // the standing sheet, built once at the corpus audit
    val verdicts = Ensemble.feedPolicy(docs, pos)
      .select(col("source"), col("verdict"))
    val batchKept = Ensemble.applyFeedPolicy(docs, pos)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val results = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val stream = MemoryStream[(Long, String, String, String)](spark)
    val q = stream.toDF().toDF("doc_id", "text", "lang", "source")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          results += Curation.feedPolicyGate(b, verdicts)
            .select("doc_id").collect().map(_.getLong(0)).toSet
        ()
      }
      .start()
    try {
      stream.addData(fixture: _*); q.processAllAvailable()
      // arrivals from a feed the standing sheet has never measured
      stream.addData((5001L, "fresh feed text one", "en", "newfeed"),
        (5002L, "fresh feed text two", "en", "newfeed"))
      q.processAllAvailable()
    } finally q.stop()

    assert(results.length == 2)
    assert(results.head == batchKept,
      s"gate minus act: ${results.head -- batchKept}; " +
        s"act minus gate: ${batchKept -- results.head}")
    assert(!results.head.exists(_ > 1000L),
      "the dropped mirror feed's arrivals must vanish at the door")
    assert(results(1) == Set(5001L, 5002L),
      "a never-measured feed passes whole — the q162 NULL rule at ingest")
  }
}
