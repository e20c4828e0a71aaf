package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** S5 parity shim (SURVEY §2.1): the reference's NiFi `PutSQL` stage —
  * batched JDBC INSERTs into MySQL (`nifi-project.xml:1116`, batch size
  * 100, pool of 8). Not in the analytics path; exposed for pipeline
  * completeness. No database ships in CI, so this stays a thin,
  * configuration-only wrapper over Spark's built-in JDBC sink (which
  * already batches inserts and parallelizes one connection per
  * partition — `numPartitions` is the pool-size analogue). */
object JdbcWriter {

  def write(df: DataFrame, url: String, table: String,
      user: String, password: String,
      batchSize: Int = 100, maxConnections: Int = 8,
      mode: SaveMode = SaveMode.Append): Unit =
    // repartition, not coalesce: coalesce would propagate upstream and
    // strangle the parallelism of the computation feeding the sink.
    df.repartition(maxConnections)
      .write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .save()
}
