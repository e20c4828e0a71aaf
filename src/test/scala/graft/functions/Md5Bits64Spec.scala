package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Md5Bits64]] must be VOTE-identical to the legacy 16-digit
  * `instr`/`substring` formulation of the simhash kernel: for every
  * (digit k, bit b), `shiftrightunsigned(v, 4·(15−k)+b) & 1 = 1`
  * exactly when the legacy `(d_k div 2^b) % 2 = 1` — including the
  * non-hex case, where the legacy digit −1 and the packed 0 both vote
  * −1 on all four bits. Any divergence silently flips simhash bits and
  * breaks the q45/q47 oracles. */
class Md5Bits64Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bit votes identical to the legacy digit formulation on digests and adversarial inputs") {
    graft.GraftSession.ensureConfs(spark)
    val fixtures = Seq(
      "", "a", "0123456789abcdef", "ffffffffffffffff", "0000000000000000",
      "8000000000000000", // sign bit set: shiftrightunsigned contract
      "ABCDEF0123456789", "zz09zz09zz09zz09", "short",
      "é漢字🚀0123456789ab", "fedcba9876543210fedcba9876543210") ++
      (1 to 150).map(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"tok$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val df = fixtures.toDF("h")
      .withColumn("__v", call_function("graft_md5b64", col("h")))
    val legacyDigits = (0 until 16).map(k =>
      expr(s"instr('0123456789abcdef', substring(h, ${k + 1}, 1)) - 1").as(s"d$k"))
    val voteCols = (0 until 16).flatMap { k =>
      (0 until 4).flatMap { b =>
        Seq(
          expr(s"CASE WHEN (shiftrightunsigned(__v, ${4 * (15 - k) + b}) & 1) = 1" +
            " THEN 1 ELSE -1 END").as(s"fast_${k}_$b"),
          expr(s"CASE WHEN (d$k div ${1 << b}) % 2 = 1 THEN 1 ELSE -1 END")
            .as(s"slow_${k}_$b"))
      }
    }
    val rows = df.select(col("h") +: col("__v") +: legacyDigits: _*)
      .select(col("h") +: voteCols: _*)
      .collect()
    rows.foreach { r =>
      (0 until 16).foreach { k =>
        (0 until 4).foreach { b =>
          val fast = r.getAs[Int](s"fast_${k}_$b")
          val slow = r.getAs[Int](s"slow_${k}_$b")
          assert(fast == slow,
            s"vote mismatch on '${r.getString(0)}' digit $k bit $b: fast=$fast slow=$slow")
        }
      }
    }
    // NULL propagates
    val n = Seq[Option[String]](None).toDF("h")
      .select(call_function("graft_md5b64", col("h"))).collect()
    assert(n.head.isNullAt(0))
  }
}
