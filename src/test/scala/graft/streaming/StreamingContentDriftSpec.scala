package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{Drift, Sampling}

/** The content-drift monitor's streaming face (q158 at INGEST): with
  * the standing hashed-bigram occupancy broadcast as ONE model row
  * ([[Drift.contentKlModel]]), each micro-batch is scored by
  * [[Drift.klAgainstModel]] inside `foreachBatch` — zero streaming
  * state, each batch its own comparison unit. The batch twin
  * ([[Drift.contentKlDrift]], q158) single-sources through the SAME
  * two kernels, so a micro-batch carrying exactly the incoming split
  * must reproduce the batch sheet bitwise. */
class StreamingContentDriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // varied-vocabulary fixture so both md5 slices carry real bigram mass
  private def fixture: Seq[(Long, Option[String])] =
    (1L to 60L).map { i =>
      val text: Option[String] =
        if (i % 10 == 0) None
        else Some((0 until 18).map(j => s"word${(i * 3 + j) % 23} tag${j % 5}").mkString(" "))
      (i, text)
    }

  private def sheet(df: DataFrame): (Long, Long, Long, Long) = {
    val r = df.select("n_bigrams", "n_buckets", "kl_q", "alert").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("a micro-batch carrying the incoming split reproduces the q158 sheet bitwise") {
    val docs = fixture.toDF("doc_id", "text")
    val batchSheet = sheet(Drift.contentKlDrift(docs))
    assert(batchSheet._1 > 0L, "the incoming split must carry bigrams")

    // static state, built once from the standing slice — exactly what
    // q158 derives internally
    val flagged = Sampling.withSplitBucket(docs, "doc_id")
      .withColumn("__new", col("__bucket") < 100)
    val model = Drift.contentKlModel(flagged.filter(!col("__new")))
    val incoming = flagged.filter(col("__new"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(incoming.nonEmpty, "fixture must put docs in the incoming split")

    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    val stream = MemoryStream[(Long, Option[String])](spark)
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) results += sheet(Drift.klAgainstModel(b, model))
        ()
      }
      .start()
    try {
      stream.addData(incoming.toSeq: _*); q.processAllAvailable()
      // a template-injection second batch — all bigram mass in ONE
      // bucket: its own independent sheet must alarm against the same
      // standing model
      stream.addData(
        (9001L, Option(Seq.fill(2001)("spam").mkString(" "))))
      q.processAllAvailable()
    } finally q.stop()

    assert(results.length == 2)
    assert(results.head == batchSheet,
      s"streamed ${results.head} != batch $batchSheet")
    val second = results(1)
    assert(second._1 == 2000L && second._2 == 1L, "one bucket, 2000 occurrences")
    assert(second._4 == 1L, "a boilerplate storm must alarm")
  }
}
