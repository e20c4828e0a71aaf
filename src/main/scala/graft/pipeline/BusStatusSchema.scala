package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The Debezium CDC envelope + bus_status domain schema.
  *
  * Parity notes (SURVEY §1.2-1.4, §2.5.5; reference:
  * `bus_status_schema.json:1`, `01-setup-ec-vm.md:321-333`):
  *
  * The reference obtains its runtime schema by JSON *inference* over one
  * sample envelope (`spark.read.json(file).schema`,
  * `01-setup-ec-vm.md:164`), so parse-time types are the inference types —
  * every integer is LongType, everything nullable. We hand-write that
  * exact shape (deterministic, no startup batch job) and keep a
  * [[schemaOf]] helper for behavioral parity with the reference's
  * bootstrap path. `event_time` is wire-format epoch-millis
  * (io.debezium.time.Timestamp) at parse time; [[EnvelopeParser.normalize]]
  * converts to TimestampType.
  */
object BusStatusSchema {

  /** bus_status row as JSON inference sees it (all long/double/string,
    * all nullable). */
  val busStatusInferred: StructType = StructType(Seq(
    StructField("record_id", LongType),
    StructField("id", LongType),
    StructField("routeId", LongType),
    StructField("directionId", StringType),
    StructField("predictable", LongType),
    StructField("secsSinceReport", LongType),
    StructField("kph", LongType),
    StructField("heading", LongType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("leadingVehicleId", LongType),
    StructField("event_time", LongType)))

  /** `payload.source` block (Debezium connector metadata). */
  val source: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("sequence", StringType),
    StructField("table", StringType),
    StructField("server_id", LongType),
    StructField("gtid", StringType),
    StructField("file", StringType),
    StructField("pos", LongType),
    StructField("row", LongType),
    StructField("thread", LongType),
    StructField("query", StringType)))

  /** The 3-level envelope: payload.{before,after,source,op,ts_ms,
    * transaction}. The wire `schema` descriptor block is intentionally
    * absent — the reference never projects it and Catalyst would prune it
    * anyway (SURVEY §2.5.2). */
  val envelope: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", busStatusInferred),
      StructField("after", busStatusInferred),
      StructField("source", source),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("transaction", StructType(Seq(
        StructField("id", StringType),
        StructField("total_order", LongType),
        StructField("data_collection_order", LongType)))))))))

  /** Reference-parity schema bootstrap (op S2): infer from a sample
    * envelope file exactly like `01-setup-ec-vm.md:164`. */
  def schemaOf(spark: SparkSession, sampleFile: String): StructType =
    spark.read.json(sampleFile).schema

  /** Normalized domain row (post-[[EnvelopeParser.normalize]]). */
  val busStatusNormalized: StructType = StructType(Seq(
    StructField("record_id", IntegerType),
    StructField("id", IntegerType),
    StructField("routeId", IntegerType),
    StructField("directionId", StringType),
    StructField("predictable", IntegerType),
    StructField("secsSinceReport", IntegerType),
    StructField("kph", IntegerType),
    StructField("heading", IntegerType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("leadingVehicleId", IntegerType),
    StructField("event_time", TimestampType)))
}

/** Typed view of a normalized bus_status row. Only `record_id` is
  * non-optional ([[EnvelopeParser.dropTombstones]] guarantees it);
  * every other field can be null on the wire — partial after-images are
  * legal Debezium — and an Option-less field would make the encoder
  * throw mid-job on the first sparse row. */
final case class BusStatus(
    record_id: Int,
    id: Option[Int],
    routeId: Option[Int],
    directionId: Option[String],
    predictable: Option[Int],
    secsSinceReport: Option[Int],
    kph: Option[Int],
    heading: Option[Int],
    lat: Option[Double],
    lon: Option[Double],
    leadingVehicleId: Option[Int],
    event_time: Option[java.sql.Timestamp])
