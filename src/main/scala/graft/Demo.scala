package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Runnable end-to-end demo of the reference pipeline (SURVEY §3), fully
  * self-contained: a restbus-style envelope generator standing in for
  * NiFi→MySQL→Debezium→Kafka (SURVEY §3.3 stages 1-4), Structured
  * Streaming micro-batches through the P1-P4 transform, the K2 keyed
  * upsert into a routeId-partitioned table, and the Athena-parity SQL
  * layer on top.
  *
  *   tools/run_verify.sh _ _ graft.Demo
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-demo")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val table = java.nio.file.Files.createTempDirectory("bus_status").toString
    val cp = java.nio.file.Files.createTempDirectory("checkpoint").toString

    // --- stage 1-4 stand-in: deterministic envelope generator ----------
    val rnd = new scala.util.Random(42)
    def envelope(recordId: Int, routeId: Int, kph: Int, eventTime: Long): String =
      s"""{"schema":{},"payload":{"before":null,"after":{"record_id":$recordId,
         |"id":${8000 + recordId},"routeId":$routeId,"directionId":"${routeId}_0_$routeId",
         |"predictable":1,"secsSinceReport":${rnd.nextInt(30)},"kph":$kph,
         |"heading":${rnd.nextInt(360)},"lat":${43.6 + rnd.nextDouble() / 100},
         |"lon":${-79.4 - rnd.nextDouble() / 100},"leadingVehicleId":null,
         |"event_time":$eventTime},"op":"c","ts_ms":$eventTime,
         |"transaction":null}}""".stripMargin.replaceAll("\n", "")

    val stream = MemoryStream[String](spark)

    // --- three polling cycles: inserts, updates, out-of-order replays --
    def drain(): Unit =
      streaming.BusPipeline.run(stream.toDF(), table, cp).awaitTermination()

    stream.addData((1 to 20).map(i => envelope(i, i % 4, rnd.nextInt(60), 1656980000000L + i)): _*)
    drain()
    println(s"[demo] poll 1: ${sinks.UpsertWriter.readTable(spark, table).count()} vehicles tracked")

    stream.addData((1 to 10).map(i => envelope(i, i % 4, 99, 1656980100000L + i)): _*)
    drain()

    stream.addData( // late + duplicate deliveries: must be no-ops
      envelope(1, 1, 11, 1656979000000L),
      envelope(2, 2, 99, 1656980100002L))
    drain()

    // --- Athena-parity SQL layer (Q1) ----------------------------------
    val t = sinks.UpsertWriter.readTable(spark, table)
    t.createOrReplaceTempView("bus_status")
    println("[demo] final state (latest position per vehicle, partitioned by routeId):")
    spark.sql(
      """SELECT routeId, count(*) AS vehicles, sum(CASE WHEN kph = 99 THEN 1 ELSE 0 END) AS updated
        |FROM bus_status GROUP BY routeId ORDER BY routeId""".stripMargin)
      .show(truncate = false)

    val total = t.count()
    val updated = t.filter($"kph" === 99).count()
    assert(total == 20, s"expected 20 unique vehicles, got $total")
    assert(updated == 10, s"expected 10 updated vehicles, got $updated")
    println(s"[demo] OK: $total unique vehicles, $updated carrying the poll-2 update, late/dup events ignored")

    // --- extension surface: the dedup pipeline END-TO-END --------------
    // documents → near-dup pairs (minhash ∪ simhash) → transitive
    // clusters → canonical keep-set: the full "dedup you can actually
    // run" composition (q28/q47 → q58 → q59) on driver data.
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = operators.Dedup.nearDupPairs(docs).select("a_id", "b_id")
      .union(operators.Dedup.simhashNearDupPairs(docs, maxHamming = 5).select("a_id", "b_id"))
    // the star iteration (and, upstream of it, the minhash AND simhash
    // pair pipelines) runs ONCE; both consumers read the resulting
    // components frame, which is backed by materialized converged edges
    val comp = operators.ConnectedComponents.components(pairs)
    val labeled = operators.ConnectedComponents.clusterLabelsFromComponents(docs, "doc_id", comp)
    val kept = operators.ConnectedComponents.keepCanonicalFromComponents(docs, "doc_id", comp)
    val nDocs = docs.count()
    val nKept = kept.count()
    val nDropped = labeled.filter($"doc_id" =!= $"cluster_id").count()
    assert(nKept == nDocs - nDropped,
      s"keep-set invariant violated: $nKept != $nDocs - $nDropped")
    assert(nDropped > 0, "driver documents contain planted near-dups; the pipeline must drop some")
    val nClusters = labeled.filter($"doc_id" =!= $"cluster_id")
      .select("cluster_id").distinct().count()
    println(s"[demo] dedup: $nDocs docs -> $nKept kept; " +
      s"$nDropped near-dup members dropped from $nClusters multi-doc clusters")
    spark.stop()
  }
}
