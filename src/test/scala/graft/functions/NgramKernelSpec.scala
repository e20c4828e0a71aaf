package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property tests for the shared n-gram / run-length kernels: random
  * token arrays (including empty strings, repeats, and single-token
  * docs) are pushed through the Spark expressions and compared with
  * straightforward Scala reference implementations (raw ScalaCheck
  * generators; the scalatestplus bridge isn't in the offline cache).
  * Generation is SEEDED (pureApply with a fixed Seed) so a failure is
  * replayable and generation can never surface as a None.get. */
class NgramKernelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val tokenGen = Gen.oneOf("a", "b", "ab", "", "zz")

  private def sampled[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def eval(tokens: Seq[Seq[String]], colFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    tokens.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "toks")
      .select(col("id"), colFn(col("toks")).as("out"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap

  test("tokenNgrams(n) equals sliding(n).mkString for n in 2..4 on random docs") {
    val docs = sampled(Gen.listOfN(40, Gen.listOf(tokenGen)), seed = 41L)
    (2 to 4).foreach { n =>
      val got = eval(docs, c => TextFunctions.tokenNgrams(c, n))
      docs.zipWithIndex.foreach { case (t, i) =>
        val want = t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        assert(got(i).asInstanceOf[scala.collection.Seq[String]].toSeq == want, s"n=$n doc=$t")
      }
    }
  }

  test("maxTokenRun equals a reference fold on random repeat-heavy docs") {
    val docs = sampled(Gen.listOfN(60, Gen.listOf(Gen.oneOf("a", "b", "a", ""))), seed = 42L)
    val got = eval(docs, TextFunctions.maxTokenRun)
    docs.zipWithIndex.foreach { case (t, i) =>
      var prev: Option[String] = None; var run = 0L; var best = 0L
      t.foreach { x =>
        run = if (prev.contains(x)) run + 1 else 1; prev = Some(x)
        best = math.max(best, run)
      }
      assert(got(i).asInstanceOf[Long] == best, s"doc=$t")
    }
  }

  test("degenerate inputs: empty array, single token, all-identical tokens") {
    val docs = Seq(Seq.empty[String], Seq("only"), Seq.fill(64)("same"))
    val runs = eval(docs, TextFunctions.maxTokenRun)
    assert(runs(0).asInstanceOf[Long] == 0L)
    assert(runs(1).asInstanceOf[Long] == 1L)
    assert(runs(2).asInstanceOf[Long] == 64L)
    val grams = eval(docs, c => TextFunctions.tokenNgrams(c, 3))
    assert(grams(0).asInstanceOf[scala.collection.Seq[String]].isEmpty)
    assert(grams(1).asInstanceOf[scala.collection.Seq[String]].isEmpty)
    assert(grams(2).asInstanceOf[scala.collection.Seq[String]].size == 62)
  }

  test("null elements restart runs at length 1 (HOF restart-branch semantics)") {
    val docs: Seq[Seq[String]] = Seq(
      Seq("a", "a", null, "a", "a", "a"), // null breaks the first run; best = 3
      Seq(null, null, null),              // each null anchors a fresh length-1 run
      Seq("a", null, "a"))                // a null never extends, even between equals
    val runs = eval(docs, TextFunctions.maxTokenRun)
    assert(runs(0).asInstanceOf[Long] == 3L)
    assert(runs(1).asInstanceOf[Long] == 1L)
    assert(runs(2).asInstanceOf[Long] == 1L)
  }
}
