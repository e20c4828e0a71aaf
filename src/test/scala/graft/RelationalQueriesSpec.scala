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

  /** Every node of an executed plan, descending through AQE wrappers
    * (the adaptive root and materialized query stages hide their
    * subtrees from plain `children`). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      // a reused exchange is a LEAF whose metrics live on the original
      // it points at — descend, or an executed plan's build side shows
      // no BroadcastExchange at all
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("every registered query runs on sf0.001 and returns rows") {
    var bnljSeen = 0
    var bcastRowsSeen = 0L
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      // Execute THIS dataset's own QueryExecution: df.count() would
      // plan and run a NEW one (groupBy().count()), leaving the
      // executedPlan inspected below with never-updated SQLMetrics —
      // the broadcast-size check would read 0 forever and guard
      // nothing. toRdd.count() materializes the same plan instance
      // whose metrics are read.
      val n = df.queryExecution.toRdd.count()
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
      // Second net: a BroadcastNestedLoopJoin is only survivable when
      // its BROADCAST side is genuinely small (the engine's deliberate
      // cross joins broadcast query vectors, centroids, one-row argmax
      // frames — tens to hundreds of rows). A corpus-sized relation
      // showing up on the build side means a both-sides-large nested
      // loop: fatal at scale long before CartesianProduct would be.
      // The toRdd.count() above executed THIS plan instance, so the
      // check reads the ACTUAL broadcast row count, not an estimate.
      for (b <- allNodes(df.queryExecution.executedPlan)
          .collect { case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j }) {
        bnljSeen += 1
        val buildPlan =
          if (b.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight) b.right else b.left
        val bcastRows = allNodes(buildPlan)
          .collect { case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e }
          .flatMap(_.metrics.get("numOutputRows")).map(_.value)
        assert(bcastRows.nonEmpty,
          s"$name: BroadcastNestedLoopJoin build side carries no BroadcastExchange metrics")
        assert(bcastRows.forall(_ <= 2000L),
          s"$name: BroadcastNestedLoopJoin broadcasts ${bcastRows.max} rows — " +
            "a large relation reached a nested-loop build side; at scale this query cannot run")
        bcastRowsSeen += bcastRows.sum
      }
    }
    // Metric-read non-vacuity: if the metrics were read off a plan that
    // never executed they'd all be 0 (the exact bug this guard once
    // had) — the known broadcast cross joins ship real vectors, so a
    // zero total means the read went dead, not that the joins shrank.
    assert(bcastRowsSeen > 0L,
      "every BroadcastNestedLoopJoin build-side metric read 0 — the " +
        "metric read is off a never-executed plan instance again")
    // Non-vacuity: the similarity family deliberately plans several
    // broadcast cross joins (q30/q46/q49 query vectors, centroids) —
    // if the AQE traversal ever stops finding them, the guard above is
    // checking nothing and must be fixed, not trusted.
    assert(bnljSeen >= 3,
      s"plan traversal found only $bnljSeen BroadcastNestedLoopJoins across the fleet — " +
        "the guard lost sight of the known broadcast cross joins")
  }

  test("filtered scans push their predicates into parquet (q01/q03/q06)") {
    // The positive half of the pushdown story: PLANS.md shows the
    // PushedFilters today; this guard fails the build if a future
    // change (a cast, a wrapped column, an expression rewrite) silently
    // un-pushes a filter and turns the scan into read-everything.
    val pushed = "PushedFilters: \\[\\s*[A-Za-z]".r
    for (name <- Seq("q01_agg_pricing_summary", "q03_filter_pushdown", "q06_anti_join")) {
      val df = SparkEntry.queries(name)(spark, sf001)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(pushed.findFirstIn(plan).isDefined,
        s"$name: no non-empty PushedFilters in any parquet scan — " +
          "a predicate stopped reaching the data source")
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
