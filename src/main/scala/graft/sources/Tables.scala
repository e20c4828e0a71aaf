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
  /** `events.ts` is parquet TIMESTAMP(NANOS): Spark has no nanos
    * TimestampType, so the session reads it as epoch-nanos long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set by [[graft.GraftSession]])
    * and we normalize to a micros timestamp here. Integer `div` — a
    * double division would lose precision above 2^53 epoch-nanos. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.ensureConfs(spark)
    read(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
