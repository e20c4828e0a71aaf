package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Mixing

/** The q161 keep rule's streaming twin: with the standing DSIR model
  * row and cut row broadcast, [[Curation.resampleGate]] is a
  * stateless per-batch filter keyed through the SAME
  * [[Mixing.withGumbelKey]] kernel as the batch resample. Pins: a
  * streamed batch of standing-corpus docs keeps BITWISE the q161
  * keep-set — ids, weights and keys; novel-bucket arrivals weigh by
  * the model's lr0 (never crash); a NULL cut (empty standing corpus)
  * keeps nothing. */
class StreamingResampleGateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // the MixingSpec planted two-distribution corpus, halved for speed
  private def fixture: Seq[(Long, String, String)] = {
    def textA(i: Long) = (0 until 24).map(j => s"alpha${(i * 3 + j) % 12}").mkString(" ")
    def textB(i: Long) = (0 until 24).map(j => s"beta${(i * 5 + j) % 12}").mkString(" ")
    (1L to 200L).map { i =>
      val aish = i % 10 < 3
      (i, if (aish) textA(i) else textB(i), if (aish) "aset" else "bset")
    }
  }

  test("streamed gate keeps bitwise the batch resample's keep-set") {
    val docs = fixture.toDF("doc_id", "text", "source")
    val model = Mixing.dsirModelRow(docs)
    val cut = Mixing.resampleCutRow(docs, budgetPermille = 300)
    val batchKept = Mixing.dsirResample(docs, budgetPermille = 300)
      .select("doc_id", "n_bigrams", "weight_q", "key_q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batchKept.nonEmpty && batchKept.size < 200)

    val results = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, Long, Long, Long)]]
    val stream = MemoryStream[(Long, String, String)](spark)
    val q = stream.toDF().toDF("doc_id", "text", "source")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          results += Curation.resampleGate(b, model, cut)
            .select("doc_id", "n_bigrams", "weight_q", "key_q").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        ()
      }
      .start()
    try {
      stream.addData(fixture: _*); q.processAllAvailable()
      // arrivals with novel vocabulary (buckets the standing sheet
      // never saw) weigh by lr0 and pass or drop deterministically —
      // never crash; a null-text arrival weighs 0
      stream.addData((9001L, "zzz0 zzz1 zzz2 zzz3 zzz4", "newfeed"),
        (9002L, null.asInstanceOf[String], "newfeed"))
      q.processAllAvailable()
    } finally q.stop()

    assert(results.length == 2)
    assert(results.head == batchKept,
      s"gate minus batch: ${(results.head -- batchKept).take(3)}; " +
        s"batch minus gate: ${(batchKept -- results.head).take(3)}")
    assert(results(1).forall(t => t._1 > 9000L),
      "second batch emits only the novel arrivals (kept or not, per key vs cut)")
  }

  test("empty standing corpus arms a keep-nothing gate; budget 1000 keeps all") {
    val docs = fixture.toDF("doc_id", "text", "source")
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val gateNone = Curation.resampleGate(docs,
      Mixing.dsirModelRow(empty), Mixing.resampleCutRow(empty, 300))
    assert(gateNone.count() == 0L, "NULL cut keeps nothing")
    val gateAll = Curation.resampleGate(docs,
      Mixing.dsirModelRow(docs), Mixing.resampleCutRow(docs, 1000))
    assert(gateAll.count() == 200L, "budget 1000 keeps everything")
  }
}
