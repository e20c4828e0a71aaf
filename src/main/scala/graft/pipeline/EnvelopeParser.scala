package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference ops P1–P4 as one documented transform (SURVEY §2.1):
  * binary→string cast, JSON parse against the envelope schema, nested
  * projection of the new-row image, star expansion to the 12 domain
  * columns — `df.select(col("value").cast("string")) →
  * withColumn(from_json) → select("jsonData.payload.after.*")`
  * (reference `01-setup-ec-vm.md:180/:257/:364/:421`).
  *
  * All stages are codegen'd Catalyst expressions (`Cast`,
  * `JsonToStructs`, `GetStructField`); Spark's `OptimizeJsonExprs` prunes
  * the parse to only the `payload.after` subtree, so at 100 TB the JSON
  * decoder never materializes `before`/`source`/`transaction`.
  *
  * Quirk decisions (SURVEY §2.5): the reference's accidental
  * DataFrame-level `.alias("value")` is dropped (no-op); malformed JSON
  * yields a null struct (PERMISSIVE mode) → an all-null row, filtered by
  * [[dropTombstones]].
  */
object EnvelopeParser {

  /** P1–P4: envelope string/binary column `value` → 12 inference-typed
    * domain columns. Works identically on batch and streaming frames. */
  def parse(envelopes: DataFrame): DataFrame =
    envelopes
      .select(col("value").cast("string").as("value"))
      .withColumn("jsonData", from_json(col("value"), BusStatusSchema.envelope))
      .select("jsonData.payload.after.*")

  /** Drop rows with no after-image: delete events (`op=d` → after=null)
    * and malformed JSON both surface as null-key rows. */
  def dropTombstones(parsed: DataFrame): DataFrame =
    parsed.filter(col("record_id").isNotNull)

  /** Documented normalization step (SURVEY §2.5.5/.6): inference longs →
    * ints, epoch-millis `event_time` → TimestampType. Kept separate from
    * [[parse]] so byte-level parity with the reference's runtime types is
    * still observable before this step. */
  def normalize(parsed: DataFrame): DataFrame =
    parsed.select(
      col("record_id").cast("int").as("record_id"),
      col("id").cast("int").as("id"),
      col("routeId").cast("int").as("routeId"),
      col("directionId"),
      col("predictable").cast("int").as("predictable"),
      col("secsSinceReport").cast("int").as("secsSinceReport"),
      col("kph").cast("int").as("kph"),
      col("heading").cast("int").as("heading"),
      col("lat"), col("lon"),
      col("leadingVehicleId").cast("int").as("leadingVehicleId"),
      expr("timestamp_millis(event_time)").as("event_time"))

  /** The full pipeline transform: parse → drop tombstones → normalize. */
  val transform: DataFrame => DataFrame =
    (parse _).andThen(dropTombstones).andThen(normalize)
}
