package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark

case class Reading(ts: Timestamp, route_id: Long, speed: Double)

/** Stream-static join — the dimension-enrichment shape (each
  * micro-batch joins against a batch table; no watermark needed on the
  * static side, and the stream stays append-able because the static
  * side is treated as immutable within a batch). Complements
  * [[StreamStreamJoinSpec]]: together they cover SURVEY §2.2's join
  * rows under streaming execution. */
class StreamStaticJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("a streaming frame enriches against a static dimension, inner and left-outer") {
    val routes = Seq((510L, "Spadina"), (504L, "King")).toDF("route_id", "route_name")
    val stream = MemoryStream[Reading](spark)

    val enriched = stream.toDF()
      .join(broadcast(routes), Seq("route_id"), "left_outer")
      .select(col("route_id"), col("route_name"), col("speed"))

    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        Reading(ts(1), 510L, 22.0),
        Reading(ts(2), 504L, 17.5),
        Reading(ts(3), 999L, 5.0)) // unknown route: must survive left-outer with NULL name
      q.processAllAvailable()
      val got = spark.table("enriched")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
      assert(got == Set(
        (510L, Some("Spadina"), 22.0),
        (504L, Some("King"), 17.5),
        (999L, None, 5.0)))

      // later batches keep enriching — the static side is joined per batch
      stream.addData(Reading(ts(4), 510L, 30.0))
      q.processAllAvailable()
      assert(spark.table("enriched").count() == 4)
    } finally q.stop()
  }
}
