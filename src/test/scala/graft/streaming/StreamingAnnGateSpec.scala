package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Similarity

/** The vector family's streaming twin — the q114 frozen-decision rule
  * at INGEST: with the centroid row and the per-cell kept-representative
  * map broadcast as static one-row frames,
  * [[Curation.annDedupGate]] is a stateless map-side probe, and a
  * streamed batch's dispositions must equal
  * [[Similarity.incrementalSemanticDedup]]'s batch output wherever the
  * batch op's within-batch rule is idle (a per-row gate cannot see
  * batch-mates — that half composes with watermarked dedup or a landed
  * q114 pass, documented on the gate). */
class StreamingAnnGateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // the q114 hand-built geometry (SimilaritySpec's incremental test):
  // one cell; standing 20=(1,0,0) keeps, 21=(1,.3,0) drops (cos .958
  // to 20), 50=(0,1,0) keeps. New arrivals:
  //  - 5 ≈ kept-standing 50: must drop even though 5 < 50 (frozen
  //    standing decisions);
  //  - 7=(1,.6,0): cos .969 to DROPPED 21 but .857 to kept 20 — must
  //    survive (only kept standing vectors veto);
  //  - 3=(0,0,1): far from everything — keeps.
  private val standing = Seq(
    (20L, Array(1f, 0f, 0f)), (21L, Array(1f, 0.3f, 0f)), (50L, Array(0f, 1f, 0f)))
  private val arrivals = Seq(
    (3L, Array(0f, 0f, 1f)), (5L, Array(0.01f, 1f, 0f)), (7L, Array(1f, 0.6f, 0f)))
  private val oneCell = Seq((0L, Array(1f, 1f, 1f)))

  test("stream-gated dispositions equal q114's batch decisions on the same fixture") {
    val standingDf = standing.toDF("vec_id", "embedding")
    val centDf = oneCell.toDF("vec_id", "embedding")
    val batch = Similarity.incrementalSemanticDedup(
      (standing.map { case (i, v) => (i, v, false) } ++
        arrivals.map { case (i, v) => (i, v, true) })
        .toDF("vec_id", "embedding", "is_new"),
      "is_new", centDf, threshold = 0.95, dim = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val centRow = Similarity.annGateCentroids(centDf, dim = 3)
    val keptRow = Similarity.annGateKeptIndex(standingDf, centDf,
      threshold = 0.95, dim = 3)
    val stream = MemoryStream[(Long, Array[Float])](spark)
    val gated = Curation.annDedupGate(
      stream.toDF().toDF("vec_id", "embedding"), centRow, keptRow,
      threshold = 0.95, dim = 3)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("ann_gate").start()
    try {
      stream.addData(arrivals.take(1): _*); q.processAllAvailable()
      stream.addData(arrivals.drop(1): _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ann_gate").select("vec_id", "cell", "kept")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed.keySet == Set(3L, 5L, 7L))
    assert(streamed == batch,
      s"gate must reproduce the q114 frozen-decision sheet: stream=$streamed batch=$batch")
    assert(streamed(5L)._2 == 0L, "a kept standing vector vetoes at ingest")
    assert(streamed(7L)._2 == 1L, "a dropped standing vector must not veto")
    assert(streamed(3L)._2 == 1L)
  }

  test("gate is total: malformed arrivals and an empty standing index pass, never crash") {
    val centRow = Similarity.annGateCentroids(
      oneCell.toDF("vec_id", "embedding"), dim = 3)
    val keptRow = Similarity.annGateKeptIndex(
      standing.toDF("vec_id", "embedding"),
      oneCell.toDF("vec_id", "embedding"), threshold = 0.95, dim = 3)
    val stream = MemoryStream[(Long, Option[Array[Float]])](spark)
    val gated = Curation.annDedupGate(
      stream.toDF().toDF("vec_id", "embedding"), centRow, keptRow,
      threshold = 0.95, dim = 3)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("ann_gate_degenerate").start()
    try {
      stream.addData(
        (1L, None),                                  // null embedding
        (2L, Some(Array(1f, 2f))),                   // wrong length
        (3L, Some(Array(0f, 0f, 0f))),               // zero norm
        (4L, Some(Array(0.02f, 1f, 0f))))            // near kept 50 → drops
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ann_gate_degenerate").select("vec_id", "cell", "kept")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getLong(2))).toMap
    assert(rows.size == 4, "every arrival must emerge with a disposition")
    assert(rows(1L) == ((-1L, 1L)) && rows(2L) == ((-1L, 1L)) && rows(3L) == ((-1L, 1L)),
      s"malformed arrivals pass with NULL cell: $rows")
    assert(rows(4L)._2 == 0L, "a genuine near-dup still drops in the same micro-batch")

    // empty standing index: everything keeps
    val emptyC = Similarity.annGateCentroids(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), dim = 3)
    val emptyK = Similarity.annGateKeptIndex(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      threshold = 0.95, dim = 3)
    val s2 = MemoryStream[(Long, Array[Float])](spark)
    val g2 = Curation.annDedupGate(
      s2.toDF().toDF("vec_id", "embedding"), emptyC, emptyK,
      threshold = 0.95, dim = 3)
    val q2 = g2.writeStream.outputMode("append")
      .format("memory").queryName("ann_gate_empty").start()
    try {
      s2.addData((9L, Array(1f, 0f, 0f)))
      q2.processAllAvailable()
    } finally q2.stop()
    val r2 = spark.table("ann_gate_empty").select("vec_id", "kept").collect()
    assert(r2.length == 1 && r2.head.getLong(1) == 1L,
      "no standing index → nothing can veto")
  }
}
