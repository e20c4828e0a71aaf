package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{Drift, Sampling}

/** The monitoring family's streaming twin (q144 at INGEST): the
  * standing corpus's decile edges and bin occupancy are ONE persisted
  * model row ([[Drift.lengthPsiModel]]) broadcast to ingest; each
  * arriving micro-batch is scored against it by
  * [[Drift.psiAgainstModel]] inside `foreachBatch` — zero streaming
  * state, each batch its own comparison unit (exactly PSI's
  * semantics). The batch q144 sheet single-sources through the same
  * kernel, so when the streamed batch IS q144's incoming split the
  * two sheets must agree bitwise. */
class StreamingDriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** 400 docs with a length distribution wide enough for real decile
    * edges; the q68 md5 split (newPermille = 100) carves the incoming
    * slice the batch monitor compares. */
  private def fixture: Seq[(Long, Option[String])] =
    (1L to 400L).map { i =>
      val text =
        if (i % 50 == 0) None
        else Some((0 until (5 + (i % 37)).toInt).map(j => s"w${(i + j) % 11}").mkString(" "))
      (i, text)
    }

  private def sheet(df: DataFrame): Set[(Long, Long, Long, Long, Long, Long, Long, Long)] =
    df.select("bin", "n_std", "n_new", "rs_q", "rn_q", "psi_q", "psi_total_q", "alert")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet

  test("stream-monitored batch sheet equals the q144 batch sheet bitwise") {
    val docs = fixture.toDF("doc_id", "text")
    val batchSheet = sheet(Drift.lengthPsi(docs))
    assert(batchSheet.nonEmpty)

    // static state, built once from the standing (non-new) slice —
    // exactly what q144 derives internally
    val flagged = Sampling.withSplitBucket(docs, "doc_id")
      .withColumn("__new", col("__bucket") < 100)
    val model = Drift.lengthPsiModel(flagged.filter(!col("__new")))
    val incoming = flagged.filter(col("__new"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(incoming.nonEmpty, "fixture must put docs in the incoming split")

    val results = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, Long, Long, Long, Long, Long, Long)]]
    val stream = MemoryStream[(Long, Option[String])](spark)
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) results += sheet(Drift.psiAgainstModel(b, model))
        ()
      }
      .start()
    try {
      // ONE micro-batch carrying exactly q144's incoming split
      stream.addData(incoming.toSeq: _*); q.processAllAvailable()
      // a second, deliberately short batch: its own independent sheet
      stream.addData((9001L, Some("a b c")), (9002L, Some("d e"))); q.processAllAvailable()
    } finally q.stop()

    assert(results.length == 2)
    assert(results.head == batchSheet,
      s"stream minus batch: ${results.head -- batchSheet}; batch minus stream: ${batchSheet -- results.head}")
    // the short batch concentrates in the lowest band: its own sheet
    // must show the standing occupancy unchanged and all new mass in
    // one bin, firing the alert
    val second = results(1)
    assert(second.map(_._3).sum == 2L, "second batch mass")
    assert(second.exists(r => r._3 == 2L), "all mass in one band")
    assert(second.forall(_._8 == 1L), "a two-doc batch against a broad standing distribution must alarm")
  }

  test("monitor is total against an empty standing model") {
    val empty = Seq.empty[(Long, Option[String])].toDF("doc_id", "text")
    val model = Drift.lengthPsiModel(empty)
    val batch = Seq((1L, Some("a b c d e"))).toDF("doc_id", "text")
    val out = sheet(Drift.psiAgainstModel(batch, model))
    assert(out.size == 10)
    assert(out.forall(_._2 == 0L), "no standing mass")
    assert(out.map(_._3).sum == 1L, "batch mass binned (bin 0, NULL edges)")
  }
}
