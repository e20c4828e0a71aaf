package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Athena-layer parity (SURVEY §1.5 / reference op Q1): after
  * `Tables.registerAll`, a user types plain SQL against the same table
  * names the reference queries — the whole engine surface is reachable
  * without touching the Scala API. */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("registerAll exposes every driver table to spark.sql") {
    Tables.registerAll(spark, sf001)
    Tables.names.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1, s"$t not queryable")
    }
  }

  test("the reference's Q1 shape: scan + limit over SQL") {
    Tables.registerAll(spark, sf001)
    assert(spark.sql("SELECT * FROM orders LIMIT 100").count() == 100)
  }

  test("SQL joins/aggregates match the DataFrame formulation") {
    Tables.registerAll(spark, sf001)
    val viaSql = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val viaDf = Tables.customer(spark, sf001)
      .join(Tables.nation(spark, sf001), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaSql == viaDf)
  }

  test("native graft_dot is callable from SQL over registered tables") {
    Tables.registerAll(spark, sf001)
    val r = spark.sql(
      """SELECT vec_id, graft_dot(cast(embedding AS array<double>),
        |                         cast(embedding AS array<double>)) AS sq_norm
        |FROM embeddings WHERE vec_id < 3""".stripMargin).collect()
    assert(r.length == 3 && r.forall(_.getDouble(1) > 0))
  }
}
