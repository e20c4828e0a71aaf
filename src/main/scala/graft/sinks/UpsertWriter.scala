package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native keyed upsert table writer — the reference's one nontrivial
  * operator (K2, SURVEY §2.1/§7.4): Hudi COPY_ON_WRITE `upsert` with
  * `recordkey.field=record_id`, `precombine.field=event_time`,
  * `partitionpath.field=routeId` (`01-setup-ec-vm.md:262-272`),
  * re-expressed on stock Spark:
  *
  *  1. precombine the incoming batch: `row_number()` over
  *     (partition key, order precombine DESC) == 1 — within-batch
  *     duplicates collapse to the newest row;
  *  2. merge against current table state: union, same window, incoming
  *     rows win precombine ties (last-writer-wins, replay-idempotent);
  *  3. rewrite ONLY the touched partitions via dynamic partition
  *     overwrite — Hudi-COW-like write amplification: cost is
  *     O(touched partitions), not O(table). True file-level indexing
  *     (Hudi's bloom index) is out of scope; partition-level COW is the
  *     documented bound.
  *
  * Scale notes: the merge shuffles on the record key once; reading
  * current state is partition-pruned by the batch's touched-partition
  * set (a `.isin` filter that Catalyst turns into partition pruning).
  * `localCheckpoint` cuts the lineage so the overwrite doesn't read the
  * path it is rewriting.
  *
  * Key-partition moves: like Hudi's default (non-global) index, the
  * upsert is partition-local — a key whose `routeId` changes gets a new
  * row in the new partition and the stale row in the old partition is
  * NOT removed (the batch never touches that partition). A global-index
  * variant would read all partitions on every merge; at 100 TB that is
  * the wrong default for an append-mostly CDC stream whose partition key
  * (route) is stable per vehicle record.
  */
object UpsertWriter {

  final case class Keys(
      recordKey: String = "record_id",
      precombine: String = "event_time",
      partition: String = "routeId")

  /** Collapse duplicates within `df`: newest precombine per key wins;
    * `tiebreak` orders equal-precombine rows. */
  def precombine(df: DataFrame, keys: Keys, extraTiebreak: Seq[String] = Nil): DataFrame = {
    val order = (col(keys.precombine).desc +: extraTiebreak.map(col(_).desc))
    val w = Window.partitionBy(col(keys.recordKey)).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Upsert `batch` into the partitioned parquet table at `tableDir`. */
  def upsert(batch: DataFrame, tableDir: String, keys: Keys = Keys()): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return

    val incoming = precombine(batch, keys).withColumn("__src", lit(1))

    // Filesystem-agnostic existence check (java.io.File would silently
    // report false for hdfs://, s3a://, … and the merge would be skipped).
    val hadoopPath = new org.apache.hadoop.fs.Path(tableDir)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasTable = fs.exists(hadoopPath) &&
      fs.listStatus(hadoopPath).exists(_.getPath.getName.startsWith(s"${keys.partition}="))

    val merged = if (hasTable) {
      // Touched-partition set: micro-batch-sized, so the driver-side
      // collect is bounded by batch cardinality, not table size. A null
      // partition value needs explicit handling: isin() never matches
      // null, which would drop the table's null-partition rows from the
      // merge and let dynamic overwrite erase them.
      val touched = incoming.select(keys.partition).distinct().collect().map(_.get(0))
      val (nullTouched, nonNull) = (touched.contains(null), touched.filter(_ != null))
      val pruned = col(keys.partition).isin(nonNull.toIndexedSeq: _*) ||
        (lit(nullTouched) && col(keys.partition).isNull)
      val current = spark.read.parquet(tableDir)
        .filter(pruned)   // partition pruning
        .select(incoming.columns.filter(_ != "__src").toIndexedSeq.map(col): _*)
        .withColumn("__src", lit(0))
      current.unionByName(incoming)
    } else incoming

    val winners = precombine(merged, keys, extraTiebreak = Seq("__src")).drop("__src")

    // Cut lineage: the overwrite below must not plan a scan of tableDir.
    val materialized = winners.localCheckpoint(true)

    materialized.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(keys.partition)
      .parquet(tableDir)
  }

  /** Read current table state (partition column restored from dir names). */
  def readTable(spark: org.apache.spark.sql.SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)
}
