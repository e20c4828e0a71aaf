package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[TokenCount]] must be count-identical to the legacy
  * `size(split(text, "\\s+"))` on every input — a divergence silently
  * shifts token masses in every datasheet/allocation/packing oracle.
  * Pinned on hand fixtures covering the positional edge cases (leading
  * / trailing / consecutive whitespace, every `\s` class member,
  * unicode text, NBSP which is NOT regex `\s`) plus generated
  * strings. */
class TokenCountSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("count-identical to size(split) on fixtures and generated strings") {
    graft.GraftSession.ensureConfs(spark)
    val fixtures = Seq(
      "", " ", "  ", "a", "a b", " a", "a ", " a ", "a  b", "\ta\nb\r",
      "\f", "ab\fc", "one two  three   four",
      "é漢字 🚀 emoji", "nbsp is not ws", " ", "ends with tab\t",
      "\r\n\r\n", "mixed \t\n ws runs")
    // generated: random mixes of words and whitespace
    val rnd = new scala.util.Random(7)
    val pieces = Seq("a", "bb", "é", " ", "  ", "\t", "\n", "", "\r", "\f", "漢")
    val generated = (1 to 300).map(_ =>
      (0 until rnd.nextInt(30)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString)
    val rows = (fixtures ++ generated).toDF("t")
      .select(col("t"),
        TextFunctions.tokenCount(col("t")).as("fast"),
        size(split(col("t"), "\\s+")).cast("long").as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"count mismatch on ${r.getString(0).map(c => f"\\u$c%04x".toString).mkString}: " +
          s"fast=${r.getLong(1)} slow=${r.getLong(2)}")
    }
    // NULL propagates (legacy size(split(NULL)) is NULL under default confs)
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextFunctions.tokenCount(col("t"))).collect()
    assert(n.head.isNullAt(0))
  }
}
