package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("extensions object registers graft_dot, graft_kr and the normalize family without error") {
    new GraftExtensions().apply(new SparkSessionExtensions) // builder-path smoke
  }

  test("graft_md5b48 resolves in SQL and matches the oracle digit-tree formulation") {
    GraftSession.ensureConfs(spark)
    val tree = (0 until 12).map { j =>
      s"(instr('0123456789abcdef', substring(h, ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}L"
    }.mkString(" + ")
    val r = spark.sql(
      s"SELECT graft_md5b48(h) fast, $tree slow FROM (SELECT md5('probe') h)").head
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) >= 0L)
  }

  test("graft_nfc/graft_nfd resolve via the runtime registry with correct semantics") {
    GraftSession.ensureConfs(spark)
    val eDec = "é" // e + combining acute
    val ePre = "é"  // precomposed
    val r = spark.sql(s"SELECT graft_nfc('$eDec') c, graft_nfd('$ePre') d, graft_nfc(NULL) n").head
    assert(r.getString(0) == ePre && r.getString(1) == eDec && r.isNullAt(2))
  }

  test("graft_dot resolves in SQL and matches the HOF formulation bitwise") {
    GraftSession.ensureConfs(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |  aggregate(zip_with(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d),
        |    (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) AS hof""".stripMargin).head
    assert(r.getDouble(0) == 32.0)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("graft_dot on driver embeddings equals HOF left-fold on every row") {
    GraftSession.ensureConfs(spark)
    graft.sources.Tables.registerAll(spark, sf001)
    val bad = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) n,
        |    aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>),
        |      (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) h
        |  FROM embeddings) WHERE n <> h""".stripMargin).head.getLong(0)
    assert(bad == 0L)
  }
}
