package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Dedup

/** [[Md5Base48]] must be BIT-IDENTICAL to the legacy 12-term
  * `instr(alphabet, substring(h, j, 1))` expression tree it replaced —
  * the DuckDB oracles still mirror that tree verbatim
  * (`DecontaminateOracle.bucketExpr`), so any divergence silently
  * breaks every md5-bucket oracle (q55 splits, minhash bases, q83 span
  * keys). Pinned on real md5 digests AND adversarial non-hex inputs,
  * where the legacy tree has deliberately odd semantics (uppercase /
  * non-hex chars contribute −1·16^(11−j), positions past the end
  * contribute 0). */
class Md5Base48Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def legacy(hexCol: String): Column =
    (0 until 12).map { j =>
      (expr(s"instr('0123456789abcdef', substring($hexCol, ${j + 1}, 1))") - lit(1)) *
        lit(1L << (4 * (11 - j)))
    }.reduce(_ + _)

  test("bit-identical to the legacy digit tree on digests and adversarial inputs") {
    graft.GraftSession.ensureConfs(spark)
    val fixtures = Seq(
      "", "a", "0123456789ab", "ffffffffffff", "000000000000",
      "deadbeefcafe1234567890ab", "ABCDEF123456", "zzzzzzzzzzzz", "short",
      "0123456789abcdef0123456789abcdef",
      // non-ASCII forces the code-point fallback; astral chars check
      // the substring-by-codepoint (not UTF-16 unit) contract
      "é漢字🚀xyzemoji", "1é2é3é4é5é6é", "🚀🚀🚀🚀🚀🚀🚀🚀🚀🚀🚀🚀🚀") ++
      (1 to 200).map(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"doc$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val rows = fixtures.toDF("h")
      .select(col("h"), Dedup.md5Base48("h").as("fast"), legacy("h").as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"mismatch on input '${r.getString(0)}': " +
          s"fast=${r.getLong(1)} legacy=${r.getLong(2)}")
    }
    // 48-bit range on well-formed hex
    val hexOnly = rows.filter(_.getString(0).matches("[0-9a-f]{12,}"))
    assert(hexOnly.nonEmpty &&
      hexOnly.forall(r => r.getLong(1) >= 0L && r.getLong(1) < (1L << 48)))

    // NULL propagates
    val n = Seq[Option[String]](None).toDF("h")
      .select(Dedup.md5Base48("h")).collect()
    assert(n.head.isNullAt(0))
  }
}
