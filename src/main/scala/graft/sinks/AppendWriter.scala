package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Partitioned append sink — the reference's Iceberg-variant sink (K3,
  * SURVEY §2.1, `01-setup-ec-vm.md:427-430`) minus its path bug
  * (§2.5.3): plain partitioned parquet append, batch and streaming.
  * Streaming append + checkpoint gives exactly-once file output
  * (Spark's file sink commits via the manifest log). */
object AppendWriter {

  def append(df: DataFrame, tableDir: String, partition: String = "routeId"): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partition).parquet(tableDir)

  /** Streaming variant: `writeStream.format("parquet")` append mode. */
  def appendStream(df: DataFrame, tableDir: String, checkpoint: String,
      partition: String = "routeId"): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", tableDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partition)
}
