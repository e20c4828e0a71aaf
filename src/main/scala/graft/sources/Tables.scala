package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet testdata
  * (`/root/testdata/sf*`; schemas in FIXTURES.md §B).
  *
  * Scale notes (100 TB design):
  *  - All loads are plain parquet scans: column pruning and predicate
  *    pushdown reach the file scan for free (verify via
  *    `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  *  - `region`/`nation`/`supplier`/`part`/`customer` are dimension-shaped;
  *    join helpers in [[graft.queries]] broadcast them explicitly so the
  *    fact-side (`lineitem`/`orders`/`events`) never shuffles for a
  *    dim join.
  *  - No `.cache()` here: at 100 TB the fact tables do not fit in memory;
  *    callers cache only small dims when reused across queries.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** `events.ts` has drifted across testdata generations — parquet
    * TIMESTAMP(NANOS) (read as epoch-nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong`, set by [[graft.GraftSession]])
    * and parquet `timestamp[us]` (read as `timestamp_ntz`) have both been
    * observed. Branch on the read schema and normalize every shape to the
    * session-TZ `TimestampType` the query surface expects:
    *  - LongType (epoch-nanos): `timestamp_micros(ts div 1000)`. Integer
    *    `div` — double division would lose precision above 2^53 nanos.
    *  - TimestampNTZType (micros, no zone): cast to `timestamp`. Under the
    *    UTC session TZ the wall-clock value is unchanged.
    *  - TimestampType: pass through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.ensureConfs(spark)
    normalizeEventTs(read(spark, dir, "events"))
  }

  /** Normalize an events-shaped frame's `ts` column to session-TZ
    * `TimestampType`, whatever shape it was read as. Schema-driven, so it
    * works on batch AND streaming frames (a `readStream` with the raw
    * schema resolves identically). */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other (expected LongType epoch-nanos, " +
          "timestamp_ntz, or timestamp) — testdata schema drifted; update Tables.normalizeEventTs")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** All table names, for view registration. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so `spark.sql` works (Athena-layer
    * parity, SURVEY §1.5). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => read(spark, dir, n).createOrReplaceTempView(n)
    }
}
