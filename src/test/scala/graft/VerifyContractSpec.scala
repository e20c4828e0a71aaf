package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract end-to-end: Verify.main must produce one
  * parquet dir per query plus a parseable oracle_sql.json whose keys
  * are a subset of the query names (FIXTURES §B / builder prompt). */
class VerifyContractSpec extends AnyFunSuite {
  import TestSpark._

  test("Verify.main dumps every query result and valid oracle JSON") {
    val out = java.nio.file.Files.createTempDirectory("verify_contract").toString
    Verify.main(Array(sf001, out))

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(SparkEntry.queries.keySet.subsetOf(dirs),
      s"missing query outputs: ${SparkEntry.queries.keySet -- dirs}")

    // Every dumped result must be a readable parquet with a schema.
    // Non-emptiness is NOT asserted globally: pair-finding queries
    // (near-dup pairs, threshold filters) can legitimately return zero
    // rows at other scale factors/thresholds — coupling the contract to
    // incidental testdata density would fail spuriously.
    SparkEntry.queries.keySet.foreach { name =>
      assert(spark.read.parquet(s"$out/$name").schema.nonEmpty, s"$name dumped no schema")
    }
    // Fixture-guaranteed-non-empty representatives (full tables / total
    // aggregates that are non-empty at every scale factor by design).
    Seq("q01_agg_pricing_summary", "q21_scan_limit", "q23_dedup_exact").foreach { name =>
      assert(spark.read.parquet(s"$out/$name").count() > 0, s"$name dumped empty")
    }

    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    // strict JSON parse via the JDK-bundled Nashorn-free route: use
    // Spark's JSON reader as the parser
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS())
    assert(!parsed.columns.contains("_corrupt_record"), "oracle_sql.json is not valid JSON")
    assert(parsed.columns.toSet == SparkEntry.oracleSql.keySet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every oracle SQL references only driver tables") {
    val tables = graft.sources.Tables.names.toSet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      val refs = tables.filter(t => lower.contains(t))
      assert(refs.nonEmpty, s"$name oracle references no known table")
    }
  }
}
