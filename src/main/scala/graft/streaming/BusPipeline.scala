package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.pipeline.EnvelopeParser
import graft.sinks.UpsertWriter

/** The end-to-end streaming pipeline (reference entry points A/B,
  * SURVEY §3): Kafka CDC envelope stream → parse/normalize → console
  * or keyed-upsert sink, checkpointed.
  *
  * The Kafka source itself (S1) is a thin config shim: the build image
  * ships no `spark-sql-kafka` connector jar, so it is exercised in
  * production deployments only; every downstream stage is stream-source
  * agnostic (`DataFrame => DataFrame`) and CI-tested via MemoryStream
  * (SURVEY §7.6.5).
  */
object BusPipeline {

  /** S1: Kafka streaming scan (reference `spark-kafka.py:1-6`,
    * `01-setup-ec-vm.md:166-172`). `startingOffsets=latest` kept as the
    * reference default (§2.5.4). */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
      topic: String = "dbserver1.demo.bus_status",
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** P1–P4 over any envelope stream (`value` column, string or binary). */
  def transform(envelopes: DataFrame): DataFrame =
    EnvelopeParser.transform(envelopes)

  /** K1: console sink, no truncation, checkpointed
    * (`01-setup-ec-vm.md:183`). Debug path. */
  def consoleSink(df: DataFrame, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .format("console")
      .option("truncate", "false")

  /** K2: checkpointed foreachBatch → native keyed upsert
    * (`01-setup-ec-vm.md:278-284`). Each micro-batch merges
    * last-writer-wins into the partitioned table — replays after a
    * checkpoint recovery are idempotent because the merge is. */
  def upsertSink(df: DataFrame, tableDir: String, checkpoint: String,
      queryName: String = "graft-bus-streaming"): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        UpsertWriter.upsert(batch, tableDir)
      }

  /** Full pipeline with a test-friendly trigger: source → transform →
    * upsert table. `Trigger.AvailableNow` drains everything then stops
    * (deterministic tests, SURVEY §7.6.3); pass `None` for the
    * reference's default micro-batch trigger. */
  def run(envelopes: DataFrame, tableDir: String, checkpoint: String,
      trigger: Option[Trigger] = Some(Trigger.AvailableNow())): StreamingQuery = {
    val w = upsertSink(transform(envelopes), tableDir, checkpoint)
    trigger.fold(w)(w.trigger).start()
  }
}
