package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Scale stance (SURVEY §7.1): everything is declarative DataFrame/Dataset
  * work, so Catalyst + AQE own the physical planning. The knobs below are
  * the ones that matter at both test scale (local[32]) and design scale
  * (1000-executor cluster):
  *
  *  - `spark.sql.shuffle.partitions`: sized to the local core count here;
  *    on a real cluster AQE coalesces post-shuffle partitions anyway.
  *  - AQE on: runtime re-planning (skew-join splitting, dynamic coalescing,
  *    broadcast-join conversion) is the 100 TB safety net.
  *  - `parquet.nanosAsLong`: kept defensively — the driver testdata's
  *    `events.ts` has been TIMESTAMP(NANOS) in past generations (currently
  *    `timestamp[us]`); [[graft.sources.Tables.events]] branches on the
  *    read schema, and this conf makes a nanos flip-back readable instead
  *    of a hard error.
  *  - UTC session TZ: all oracle comparisons are naive-UTC.
  */
object GraftSession {

  /** Defaults applied to every session the engine creates. */
  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
    .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    configure(SparkSession.builder().master(s"local[$cores]").appName(appName), cores)
      .getOrCreate()
  }

  /** Ensure confs that queries rely on are set even when the caller built
    * the session (the driver calls `SparkEntry.entry(spark)` with its own
    * session). All of these are runtime-settable. Also registers the
    * engine's native expressions (e.g. `graft_dot`) in the session's
    * function registry. */
  def ensureConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Register once per session: re-registering an existing function
    // logs a replace warning on every query invocation (warn-spam in
    // driver logs) without changing behavior.
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
      reg.createOrReplaceTempFunction("graft_dot", GraftExtensions.buildDot, "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_pqdist")))
      reg.createOrReplaceTempFunction("graft_pqdist", GraftExtensions.buildPqDist, "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kr")))
      reg.createOrReplaceTempFunction("graft_kr", GraftExtensions.buildKr, "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_md5b48")))
      reg.createOrReplaceTempFunction("graft_md5b48", GraftExtensions.buildMd5b48, "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_md5b64")))
      reg.createOrReplaceTempFunction("graft_md5b64", GraftExtensions.buildMd5b64, "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_tokcount")))
      reg.createOrReplaceTempFunction("graft_tokcount", GraftExtensions.buildTokCount, "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ngrams")))
      reg.createOrReplaceTempFunction("graft_ngrams", GraftExtensions.buildNgrams, "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_maxrun")))
      reg.createOrReplaceTempFunction("graft_maxrun", GraftExtensions.buildMaxRun, "built-in")
    Seq("NFC", "NFD").foreach { form =>
      val name = s"graft_${form.toLowerCase}"
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, GraftExtensions.buildNormalize(form), "built-in")
    }
  }
}
