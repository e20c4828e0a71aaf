package graft.streaming

import java.io.File
import java.net.URLClassLoader

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Env-gated integration coverage for the Kafka source (reference S1,
  * `spark-kafka.py:1-7`): this image ships no `spark-sql-kafka-0-10`
  * connector jar and has no network egress to resolve one, so the spec
  * CANCELS (skips, not fails) unless `SPARK_KAFKA_JAR` points at the
  * connector jar(s). The moment an image ships the jar — set
  * `SPARK_KAFKA_JAR=/path/spark-sql-kafka.jar:/path/kafka-clients.jar:…`
  * (path-separator-delimited; the connector also needs kafka-clients,
  * spark-token-provider-kafka and commons-pool2) — this lights up and
  * verifies the wiring end-to-end at the DataFrame level:
  *
  *  - `BusPipeline.kafkaSource` resolves the `kafka` format and yields
  *    the documented 7-column Kafka schema (resolution + schema are
  *    broker-independent: the V2 source only contacts the broker when a
  *    query STARTS, so no embedded broker is needed for this layer);
  *  - the P1–P4 envelope transform composes over that schema into the
  *    12-column domain frame, still streaming.
  *
  * The jars are injected via the thread-context classloader, which is
  * exactly where Spark's `DataSource.lookupDataSource` ServiceLoader
  * scan looks first (`Utils.getContextOrSparkClassLoader`). */
class KafkaIntegrationSpec extends AnyFunSuite {
  import TestSpark._

  private val jarsEnv = sys.env.get("SPARK_KAFKA_JAR")

  test("kafkaSource resolves the connector and feeds the envelope transform") {
    assume(jarsEnv.nonEmpty,
      "SPARK_KAFKA_JAR not set; no spark-sql-kafka connector jar in this image " +
        "(documented boundary, README §coverage S1)")

    val jars = jarsEnv.get.split(File.pathSeparatorChar).filter(_.nonEmpty)
    jars.foreach(j => assert(new File(j).isFile, s"SPARK_KAFKA_JAR entry not a file: $j"))

    val prevCl = Thread.currentThread().getContextClassLoader
    val kafkaCl = new URLClassLoader(jars.map(new File(_).toURI.toURL), prevCl)
    Thread.currentThread().setContextClassLoader(kafkaCl)
    try {
      val src = BusPipeline.kafkaSource(spark, "localhost:9092", topic = "graft-it")
      assert(src.isStreaming)
      assert(src.schema.fieldNames.toSet ==
        Set("key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))

      val domain = BusPipeline.transform(src)
      assert(domain.isStreaming)
      assert(domain.schema.fieldNames.contains("record_id"))
      assert(domain.schema.fieldNames.length == 12)
    } finally {
      Thread.currentThread().setContextClassLoader(prevCl)
      kafkaCl.close()
    }
  }
}
