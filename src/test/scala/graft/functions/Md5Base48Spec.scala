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

  test("property: equals a direct reimplementation of the tree semantics on generated strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Reference semantics, implemented independently of both the
    // expression and the SQL tree: digit = alphabet position − 1 of the
    // j-th CODE POINT (−1 when absent, incl. every non-ASCII cp), 0
    // past the end.
    def reference(s: String): Long = {
      val cps = s.codePoints().toArray
      (0 until 12).map { j =>
        val d = if (j < cps.length) "0123456789abcdef".indexOf(cps(j)) else 0
        d.toLong * (1L << (4 * (11 - j)))
      }.sum
    }
    val charGen = Gen.frequency(
      8 -> Gen.oneOf("0123456789abcdef".toSeq),
      2 -> Gen.oneOf("ABCDEFxyz!@# ".toSeq),
      1 -> Gen.oneOf('é', '漢', '\uD83D')) // é, 漢, lone surrogate half
    val strGen = Gen.chooseNum(0, 40).flatMap(n => Gen.stringOfN(n, charGen))
    val inputs = (1L to 300L).map(seed =>
      strGen.pureApply(Gen.Parameters.default, Seed(seed)))
    // lone surrogates can't round-trip through UTF-8; drop malformed
    val clean = inputs.map(s => new String(
      s.getBytes("UTF-8"), "UTF-8"))
    val rows = clean.toDF("h")
      .select(col("h"), Dedup.md5Base48("h").as("fast")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == reference(r.getString(0)),
        s"property mismatch on '${r.getString(0)}'")
    }
  }
}
