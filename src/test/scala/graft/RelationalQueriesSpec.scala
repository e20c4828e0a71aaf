package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.ensureConfs(s)
    s
  }
  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
}

class RelationalQueriesSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  test("every registered query runs on sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
      // Fleet-wide plan-hygiene net: an unconstrained cartesian product
      // is the one join shape that is ALWAYS fatal at 100 TB (every
      // deliberate small-side cross join in the engine broadcasts, so
      // it plans as BroadcastNestedLoopJoin, never CartesianProduct).
      // Catches a future join whose equi-condition silently stops
      // pushing down.
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — an unbroadcast cross join " +
          "reached the physical plan; at scale this query cannot run")
    }
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q20_upsert_lww yields unique user_ids with max ts") {
    val df = SparkEntry.queries("q20_upsert_lww")(spark, sf001)
    import org.apache.spark.sql.functions._
    val n = df.count()
    assert(df.select("user_id").distinct().count() == n)
    // each kept ts is the max ts for that user
    val ev = graft.sources.Tables.events(spark, sf001)
      .groupBy("user_id").agg(max("ts").as("max_ts"))
    val bad = df.join(ev, "user_id").filter(col("ts") =!= col("max_ts")).count()
    assert(bad == 0)
  }

  test("q01 aggregates match a hand computation on sf0.001") {
    val df = SparkEntry.queries("q01_agg_pricing_summary")(spark, sf001)
    val total = df.agg(org.apache.spark.sql.functions.sum("count_order")).head.getLong(0)
    val expected = graft.sources.Tables.lineitem(spark, sf001)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
      .count()
    assert(total == expected)
  }

  override def afterAll(): Unit = () // keep shared session for other suites
}
