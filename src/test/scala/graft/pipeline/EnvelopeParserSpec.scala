package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Golden Debezium envelopes (FIXTURES.md §A.2), values from the
  * reference sample (`bus_status_schema.json:1` payload). */
object Envelopes {
  def busJson(recordId: Long = 487, id: Long = 8326, routeId: Long = 7,
      directionId: String = "7_0_7", predictable: Long = 1,
      secsSinceReport: Long = 7, kph: Long = 0, heading: Long = 166,
      lat: Double = 43.666602, lon: Double = -79.4111855,
      leadingVehicleId: Option[Long] = None,
      eventTime: Long = 1656980233000L): String = {
    val lv = leadingVehicleId.map(_.toString).getOrElse("null")
    s"""{"record_id":$recordId,"id":$id,"routeId":$routeId,"directionId":"$directionId",
       |"predictable":$predictable,"secsSinceReport":$secsSinceReport,"kph":$kph,
       |"heading":$heading,"lat":$lat,"lon":$lon,"leadingVehicleId":$lv,
       |"event_time":$eventTime}""".stripMargin.replaceAll("\n", "")
  }

  def envelope(after: String, op: String = "c", before: String = "null"): String =
    s"""{"schema":{"type":"struct"},"payload":{"before":$before,"after":$after,
       |"source":{"version":"1.9.4.Final","connector":"mysql","name":"dbserver1",
       |"ts_ms":1656980233000,"snapshot":"false","db":"demo","table":"bus_status",
       |"server_id":223344,"file":"binlog.000003","pos":4690,"row":0},
       |"op":"$op","ts_ms":1656980233462,"transaction":null}}""".stripMargin.replaceAll("\n", "")

  val insert: String = envelope(busJson())
  val update: String = envelope(busJson(eventTime = 1656980293000L, kph = 25),
    op = "u", before = busJson())
  val delete: String = envelope("null", op = "d", before = busJson())
  val malformed: String = """{"payload": {"after": {"record_id": oops"""
}

class EnvelopeParserSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def frame(values: String*) = values.toDF("value")

  test("P1-P4: insert envelope parses to the 12 inference-typed columns") {
    val parsed = EnvelopeParser.parse(frame(Envelopes.insert))
    assert(parsed.columns.toSeq == BusStatusSchema.busStatusInferred.map(_.name))
    val r = parsed.head()
    assert(r.getLong(0) == 487L)        // record_id — long: inference parity
    assert(r.getLong(2) == 7L)          // routeId
    assert(r.getString(3) == "7_0_7")   // directionId
    assert(r.getDouble(8) == 43.666602) // lat
    assert(r.isNullAt(10))              // leadingVehicleId null in sample
    assert(r.getLong(11) == 1656980233000L) // event_time epoch-ms long on the wire
  }

  test("schema parity: hand-written envelope matches the wire sample fields") {
    val after = BusStatusSchema.envelope("payload").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("after").dataType
    assert(after == BusStatusSchema.busStatusInferred)
  }

  test("delete op (after=null) and malformed JSON become tombstones and are dropped") {
    val parsed = EnvelopeParser.parse(frame(Envelopes.insert, Envelopes.delete, Envelopes.malformed))
    assert(parsed.count() == 3)                                // PERMISSIVE: null rows kept by parse
    assert(EnvelopeParser.dropTombstones(parsed).count() == 1) // ...dropped here
  }

  test("normalize: longs → ints, epoch-ms → timestamp (UTC)") {
    val n = EnvelopeParser.transform(frame(Envelopes.insert))
    assert(n.schema == BusStatusSchema.busStatusNormalized)
    val r = n.head()
    assert(r.getInt(0) == 487)
    assert(r.getTimestamp(11).toInstant.toEpochMilli == 1656980233000L)
  }

  test("missing optional fields parse as nulls") {
    val sparse = Envelopes.envelope(
      """{"record_id":9,"id":1,"routeId":2,"secsSinceReport":3,"kph":4,
        |"lat":1.5,"lon":-2.5,"event_time":1656980233000}""".stripMargin.replaceAll("\n", ""))
    val r = EnvelopeParser.parse(frame(sparse)).head()
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(7)) // directionId, predictable, heading
    assert(r.getLong(0) == 9L)
  }

  test("schemaOf helper (op S2) infers from a sample file like the reference bootstrap") {
    val f = java.nio.file.Files.createTempFile("envelope", ".json")
    java.nio.file.Files.writeString(f, Envelopes.insert)
    val inferred = BusStatusSchema.schemaOf(spark, f.toString)
    assert(inferred.fieldNames.contains("payload"))
  }
}
