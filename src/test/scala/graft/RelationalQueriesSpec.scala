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

  /** Per-row identity columns of the engine's data model: a frame
    * carrying one of these has (at least) corpus-row granularity, so
    * funneling it through a single-partition window is the q161/q165
    * scale-killer shape this net exists to reject. Sheet frames
    * (hash-bucket grids, sources, bins, vocab, centroid cells) never
    * carry these names. */
  private val IdentityCols = Set("doc_id", "key_q", "score_q", "ppl_q",
    "__u", "a_id", "b_id", "train_id", "test_id", "user_id", "event_id",
    "l_orderkey", "o_orderkey")

  /** Single-partition WindowExec findings over an executed plan:
    * windows whose partition spec is EMPTY or provably CONSTANT (every
    * partition expression traces through descendant Project aliases to
    * a literal — the `lit(0)` constant-group idiom that hash-partitions
    * every row to one task while looking partitioned). Returns one
    * `(description, identityCols, inputRows)` per finding; inputRows
    * is the row count measured off the nearest descendant metric
    * (−1 when no metric exists under the window). */
  private def singlePartitionWindows(root: org.apache.spark.sql.execution.SparkPlan)
      : Seq[(String, Set[String], Long)] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal}
    val nodes = allNodes(root)
    // exprId -> aliased child expression, from every Project in the plan
    val aliasOf: Map[Long, Expression] = nodes.collect {
      case p: org.apache.spark.sql.execution.ProjectExec =>
        p.projectList.collect { case a: Alias => a.exprId.id -> a.child }
    }.flatten.toMap
    def isConstant(e: Expression, depth: Int = 0): Boolean = e match {
      case _ if depth > 8 => false
      case _: Literal => true
      case a: Attribute =>
        aliasOf.get(a.exprId.id).exists(isConstant(_, depth + 1))
      case a: Alias => isConstant(a.child, depth + 1)
      case other => other.foldable
    }
    nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty || w.partitionSpec.forall(isConstant(_)) =>
        val ids = w.child.output.map(_.name).toSet.intersect(IdentityCols)
        val rows = allNodes(w.child)
          .flatMap(n => n.metrics.get("numOutputRows").map(_.value))
          .headOption.getOrElse(-1L)
        (w.simpleString(10), ids, rows)
    }
  }

  test("every registered query runs on sf0.001 and returns rows") {
    var bnljSeen = 0
    var bcastRowsSeen = 0L
    var spwSeen = 0
    var spwMaxRows = -1L
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
      // Third net: single-partition windows (empty OR constant
      // partition spec — the lit(0) constant-group idiom included)
      // are only survivable over SHEETS. A per-row identity column
      // in the window's input, or an input bigger than any
      // deliberate sheet, means corpus rows are serializing through
      // one task — the q161/q165 shape round 13 removed.
      for ((desc, ids, rows) <- singlePartitionWindows(df.queryExecution.executedPlan)) {
        spwSeen += 1
        spwMaxRows = math.max(spwMaxRows, rows)
        assert(ids.isEmpty,
          s"$name: single-partition window over a per-row identity frame " +
            s"(${ids.mkString(", ")}) — corpus rows through one task; " +
            s"at scale this query cannot run: $desc")
        // sheet-size backstop: the largest deliberate single-partition
        // window inputs are the 8192-bucket sheets and the radix
        // kernel's ≤ 2^16 histogram cells (r13 fleet max: 8192). A
        // bigger input means a NEW frame class is serializing through
        // one task — justify it or distribute it.
        assert(rows <= 65536L,
          s"$name: single-partition window reads $rows rows — larger " +
            s"than any deliberate sheet: $desc")
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
    // Non-vacuity for the window net: the engine deliberately rides
    // totals/ranks on single-partition windows over SHEETS (the q144
    // t_new idiom, Zipf ranks, histogram cums) — if the traversal
    // stops finding any, the identity/size guard is checking nothing.
    assert(spwMaxRows >= 0L, "no single-partition window metrics were read")
    assert(spwSeen >= 5,
      s"plan traversal found only $spwSeen single-partition windows across " +
        "the fleet — the window net lost sight of the known sheet windows")
  }

  test("single-partition-window detector flags the constant-group and identity shapes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the pre-round-13 q165 shape: unpartitioned ordered window over a
    // frame carrying doc_id. Built over spark.range, not a local Seq —
    // a LocalTableScan folds `lit(0)` into the scan and leaves no
    // Project alias for the constant trace (real queries read files,
    // where the Project survives)
    val docs = spark.range(1, 51).select(col("id").as("doc_id"),
      (col("id") % 7).as("key_q"))
    val w1 = docs.withColumn("cum",
      sum(col("key_q")).over(Window.orderBy(col("key_q").desc, col("doc_id"))
        .rowsBetween(Long.MinValue, 0)))
    w1.queryExecution.toRdd.count()
    val f1 = singlePartitionWindows(w1.queryExecution.executedPlan)
    assert(f1.nonEmpty && f1.exists(_._2.contains("doc_id")),
      s"detector missed the unpartitioned identity window: $f1")
    // the pre-round-13 q161 shape: multiQuantileDisc over a constant
    // __g group — partitioned in the PLAN, single-partition at runtime
    val w2 = graft.operators.Quantiles.multiQuantileDisc(
      docs.withColumn("__g", lit(0L)), "__g", "key_q", Seq("cut" -> 0.75))
    w2.queryExecution.toRdd.count()
    val f2 = singlePartitionWindows(w2.queryExecution.executedPlan)
    assert(f2.nonEmpty && f2.exists(_._2.contains("key_q")),
      s"detector missed the constant-group window: $f2")
    // and the legitimate shapes stay invisible: a REAL group key
    val w3 = docs.withColumn("rk",
      sum(lit(1L)).over(Window.partitionBy(col("key_q")).orderBy(col("doc_id"))
        .rowsBetween(Long.MinValue, 0)))
    w3.queryExecution.toRdd.count()
    assert(singlePartitionWindows(w3.queryExecution.executedPlan).isEmpty,
      "detector must not flag genuinely partitioned windows")
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
