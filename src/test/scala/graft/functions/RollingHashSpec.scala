package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[RollingHash]] (`graft_kr`): reference values, code-point (not
  * UTF-16 unit) folding on supplementary characters, null/empty
  * behavior, SQL registration, and codegen/interpreted agreement. */
class RollingHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val P = RollingHash.Mod

  test("reference values over code points") {
    assert(RollingHash.hash("") == 0L)
    assert(RollingHash.hash("a") == 97L)
    assert(RollingHash.hash("ab") == (97L * 131 + 98) % P)
    // U+1F600 is one code point (two UTF-16 units): must fold ONCE
    assert(RollingHash.hash("😀") == 128512L)
    assert(RollingHash.hash("a😀") == (97L * 131 + 128512L) % P)
  }

  test("DataFrame column (codegen path) agrees with the reference fold") {
    val docs = Seq("", "a", "hello world", "a😀b", "x" * 5000)
    val got = docs.toDF("s")
      .select(TextFunctions.rollingFingerprint(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == docs.map(RollingHash.hash))
  }

  test("graft_kr resolves in SQL and propagates NULL") {
    graft.GraftSession.ensureConfs(spark)
    val r = spark.sql("SELECT graft_kr('abc') AS h, graft_kr(CAST(NULL AS STRING)) AS n").head
    assert(r.getLong(0) == RollingHash.hash("abc"))
    assert(r.isNullAt(1))
  }

  test("ensureConfs is idempotent for the registration") {
    graft.GraftSession.ensureConfs(spark)
    graft.GraftSession.ensureConfs(spark)
    assert(spark.sql("SELECT graft_kr('x')").head.getLong(0) == RollingHash.hash("x"))
  }
}
