package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token and punctuation counting") {
    val r = one("Hello, world! This is fine.").select(
      TextFunctions.tokenCount($"text"), TextFunctions.punctCount($"text")).head
    assert(r.getLong(0) == 5)
    assert(r.getLong(1) == 3) // comma, bang, period
  }

  test("stopword counting is case-insensitive") {
    val r = one("The cat and THE dog").select(TextFunctions.stopwordCount($"text")).head
    assert(r.getLong(0) == 3) // the, and, the
  }

  test("quality score stays in [0,1] across driver documents") {
    val bad = graft.sources.Tables.documents(spark, sf001)
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(bad == 0)
  }

  test("langId picks the marker-dominant language") {
    assert(one("der hund und die katze und das haus")
      .select(TextFunctions.langId($"text")).head.getString(0) == "de")
    assert(one("le chat et la maison et les arbres")
      .select(TextFunctions.langId($"text")).head.getString(0) == "fr")
    assert(one("el gato y los perros y las casas")
      .select(TextFunctions.langId($"text")).head.getString(0) == "es")
    assert(one("the cat is here and the dog is there")
      .select(TextFunctions.langId($"text")).head.getString(0) == "en")
  }

  test("shingles and fingerprint: short docs yield empty/null, others deterministic") {
    val r = one("a b").select(TextFunctions.shingles3($"text"),
      TextFunctions.minShingleFingerprint($"text")).head
    assert(r.getSeq[String](0).isEmpty && r.isNullAt(1))
    val f1 = one("a b c d").select(TextFunctions.minShingleFingerprint($"text")).head.getString(0)
    val f2 = one("a b c d").select(TextFunctions.minShingleFingerprint($"text")).head.getString(0)
    assert(f1 == f2 && f1.length == 32)
  }

  test("PII redaction replaces emails and IPs, leaves clean text alone, and is idempotent") {
    val rows = Seq(
      "reach a.user+tag@sub.example.co.uk or 192.168.1.254 now",
      "no pii here just words",
      "double jane@x.io and joe@y.org plus 10.0.0.1 and 8.8.8.8",
      "already <EMAIL> redacted").toDF("text")
      .select(col("text"),
        TextFunctions.redactIps(TextFunctions.redactEmails(col("text"))).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("reach a.user+tag@sub.example.co.uk or 192.168.1.254 now")
      == "reach <EMAIL> or <IP> now")
    assert(rows("no pii here just words") == "no pii here just words")
    assert(rows("double jane@x.io and joe@y.org plus 10.0.0.1 and 8.8.8.8")
      == "double <EMAIL> and <EMAIL> plus <IP> and <IP>")
    assert(rows("already <EMAIL> redacted") == "already <EMAIL> redacted")
    // idempotence: placeholders contain no matchable characters
    val once = "reach <EMAIL> or <IP> now"
    val twice = Seq(once).toDF("text")
      .select(TextFunctions.redactIps(TextFunctions.redactEmails(col("text"))))
      .collect().head.getString(0)
    assert(twice == once)
  }

  test("fingerprint64 equals xxhash64 semantics (joinable long)") {
    val r = one("abc").select(TextFunctions.fingerprint64($"text"),
      xxhash64($"text")).head
    assert(r.getLong(0) == r.getLong(1))
  }
}
