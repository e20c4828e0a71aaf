package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Partition-invariance of the round-9 operators: every output is a
  * pure function of the DATA (md5 keys, window-by-key selections,
  * integer censuses) — so repartitioning the input arbitrarily must
  * change nothing. The invariance a 1000-executor cluster relies on:
  * input split boundaries are an accident of storage, not semantics. */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("")).toSet

  private def invariant(f: DataFrame => DataFrame): Unit = {
    val docs = Tables.documents(spark, sf001)
    val base = rows(f(docs))
    assert(base.nonEmpty)
    assert(rows(f(docs.repartition(7))) == base, "7-way hash repartition")
    assert(rows(f(docs.repartition(1))) == base, "single partition")
    assert(rows(f(docs.orderBy(col("doc_id").desc))) == base, "reordered input")
  }

  test("boilerplate scrub is partition-invariant") {
    invariant(Dedup.scrubBoilerplateUnits(_, blockTokens = 24, minDocs = 2L))
  }

  test("incremental boilerplate scrub is partition-invariant") {
    invariant { d =>
      val flagged = Sampling.withSplitBucket(d, "doc_id")
        .withColumn("is_new", col("__bucket") < 100).drop("__bucket")
      Dedup.scrubBoilerplateIncrement(flagged, "is_new", blockTokens = 24)
    }
  }

  test("bloom contamination candidates are partition-invariant") {
    invariant(Decontaminate.bloomContaminationCandidates(_))
  }

  test("eval contamination report is partition-invariant") {
    invariant(Decontaminate.evalContaminationReport(_))
  }

  test("winnow matches are partition-invariant") {
    invariant(Winnow.matches(_))
  }

  test("minhash recall audit is partition-invariant") {
    invariant(Dedup.minhashRecallAudit(_))
  }

  test("unigram-LM round is partition-invariant") {
    invariant(Phrases.unigramLmRound(_, "text"))
  }

  test("unigram-LM encode is partition-invariant") {
    invariant(Phrases.unigramEncode(_, "text"))
  }

  test("LM quality buckets are partition-invariant") {
    invariant(Phrases.lmQualityBuckets(_, "text"))
  }

  test("DSIR weights are partition-invariant") {
    invariant(Mixing.dsirWeights(_))
  }
}
