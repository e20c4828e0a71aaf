package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Generic session warmup (codegen framework, vectorized parquet
    // reader, decimal/window aggregation classes, task scheduler, JIT)
    // — touches only the 5-row region table, no query-specific work.
    spark.range(1000000).selectExpr("sum(id)").collect()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    region.selectExpr("count(*)", "sum(cast(r_regionkey as decimal(18,6)))").collect()
    region.selectExpr("max(r_name) over ()").collect()
    val results = SparkEntry.specs.map(s => s.name -> SparkEntry.queries(s.name)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output row: a plain df.count()
      // would let Catalyst prune the projected expressions and time an
      // empty-column scan for projection-only queries.
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      // failed queries report -1 so a timing regression can't mask a breakage
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    // total excludes failure sentinels (summing -1 would make a breakage
    // look FASTER); a nonzero failed count marks the run invalid instead
    val total = results.collect { case (_, v) if v >= 0 => v }.sum + failed * 1e6
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
