package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement harness for the optimization rounds (guide §1: measure
  * first). For each named query, runs the bench's exact timed action
  * twice and prints, per run: wall seconds, Catalyst phase times from
  * the QueryPlanningTracker (parsing/analysis/optimization/planning),
  * and the number of Spark jobs / stages / tasks the run submitted.
  * The gap between wall and (phases + task time / cores) is scheduling
  * and stage-barrier overhead — the thing plan-size reduction buys.
  *
  * Not part of the driver contract; a diagnostic main only.
  *
  * Usage: runMain graft.Profile q159_source_scorecard[,q166_...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    region.selectExpr("count(*)", "sum(cast(r_regionkey as decimal(18,6)))").collect()
    region.selectExpr("max(r_name) over ()").collect()

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    // GRAFT_PROFILE_JOBS=1: additionally print one line per job with its
    // wall duration and callSite, so a chain's job count decomposes to
    // the operator calls that submitted them.
    val perJob = sys.env.get("GRAFT_PROFILE_JOBS").contains("1")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          jobStartNs.put(js.jobId, (System.nanoTime(), site))
        }
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (perJob) Option(jobStartNs.remove(je.jobId)).foreach { case (t0, site) =>
          println(f"[job] id=${je.jobId} ${(System.nanoTime() - t0) / 1e3}%.0fus $site")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        taskTimeMs.addAndGet(
          sc.stageInfo.taskMetrics.executorRunTime)
      }
    })

    // tools/run_verify.sh always passes sfDir/outDir as the first two
    // args — filter to registered query names so it can launch this too
    val known = SparkEntry.specs.map(_.name).toSet
    val asked = args.flatMap(_.split(",")).filter(known)
    val names: Seq[String] =
      if (asked.nonEmpty) asked.toSeq else SparkEntry.specs.map(_.name)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuilt = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t1 = System.nanoTime()
        // listener events are async; a short quiesce keeps the counters
        // attributable to this run (diagnostic precision, not contract)
        Thread.sleep(150)
        val phases = df.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
          .mkString(" ")
        println(f"[profile] $name run$run wall=${(t1 - t0) / 1e9}%.3fs " +
          f"build=${(tBuilt - t0) / 1e9}%.3fs jobs=${jobs.get} stages=${stages.get} " +
          f"tasks=${tasks.get} taskTime=${taskTimeMs.get / 1e3}%.1fs $phases")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
