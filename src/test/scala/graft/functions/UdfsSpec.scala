package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class UdfsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("GeometricMean aggregator matches exp(mean(ln)) and partial-aggregates") {
    Udfs.register(spark)
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 5.0), ("b", 0.0)).toDF("k", "x")
      .repartition(4) // force merge() across partial buffers
    val rows = df.groupBy("k").agg(expr("geometric_mean(x)").as("gm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows("a") - 4.0) < 1e-12)          // sqrt(2*8)
    assert(math.abs(rows("b") - 5.0) < 1e-12)          // non-positive skipped
  }

  test("geometric_mean works over driver data via SQL") {
    Udfs.register(spark)
    graft.sources.Tables.registerAll(spark, sf001)
    val gm = spark.sql("SELECT geometric_mean(o_totalprice) FROM orders").head.getDouble(0)
    assert(gm > 1000 && gm < 500000)
  }

  test("slugify scalar UDF") {
    Udfs.register(spark)
    val out = spark.sql("SELECT slugify('Hello, World! 42')").head.getString(0)
    assert(out == "hello-world-42")
  }
}
