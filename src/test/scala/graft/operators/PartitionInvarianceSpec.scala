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

  test("BM25 retrieval is partition-invariant") {
    invariant(Retrieval.bm25TopK(_))
  }

  test("OOV audit is partition-invariant") {
    invariant(Phrases.oovAudit(_))
  }

  test("bigram-LM quality buckets are partition-invariant") {
    invariant(Phrases.bigramLmQuality(_))
  }

  /** The embeddings-table variant of [[invariant]] for the vector
    * family: same three adversarial layouts over the corpus side. */
  private def invariantEmb(f: DataFrame => DataFrame): Unit = {
    val embs = Tables.embeddings(spark, sf001)
    val base = rows(f(embs))
    assert(base.nonEmpty)
    assert(rows(f(embs.repartition(7))) == base, "7-way hash repartition")
    assert(rows(f(embs.repartition(1))) == base, "single partition")
    assert(rows(f(embs.orderBy(col("vec_id").desc))) == base, "reordered input")
  }

  test("quality-rule overlap matrix is partition-invariant") {
    invariant(QualityRules.overlapMatrix(_))
  }

  test("length-PSI monitor is partition-invariant") {
    invariant(Drift.lengthPsi(_))
  }

  test("source overlap matrix is partition-invariant") {
    invariant(Dedup.sourceOverlapMatrix(_))
  }

  test("classifier operating points are partition-invariant") {
    invariant(Classifier.operatingPoints(_,
      col("source").isin("src0", "src1", "src2", "src3", "src4")))
  }

  test("classifier calibration sheet is partition-invariant") {
    invariant(Classifier.calibrationSheet(_,
      col("source").isin("src0", "src1", "src2", "src3", "src4")))
  }

  test("gate agreement matrix is partition-invariant") {
    invariant(Ensemble.gateAgreement(_,
      col("source").isin("src0", "src1", "src2", "src3", "src4")))
  }

  test("zipf rank-frequency fit is partition-invariant") {
    invariant(Zipf.rankFrequencyFit(_))
  }

  test("per-source gate rates are partition-invariant") {
    invariant(Ensemble.gateRatesBySource(_,
      col("source").isin("src0", "src1", "src2", "src3", "src4")))
  }

  test("per-source dup rates are partition-invariant") {
    invariant(Dedup.dupRatesBySource(_))
  }

  test("per-source KL fingerprint is partition-invariant") {
    invariant(Mixing.sourceKlDivergence(_))
  }

  test("per-source length PSI is partition-invariant") {
    invariant(Drift.lengthPsiBySource(_))
  }

  test("label-separation sheet is partition-invariant") {
    invariantEmb(EmbeddingAudit.labelSeparationSheet(_, dim = 64))
  }

  test("content-KL drift sheet is partition-invariant") {
    invariant(Drift.contentKlDrift(_))
  }

  test("duplication profile is partition-invariant") {
    invariant(Dedup.clusterSizeProfile(_))
  }

  test("source scorecard is partition-invariant") {
    invariant(Ensemble.sourceScorecard(_,
      col("source").isin("src0", "src1", "src2", "src3", "src4")))
  }

  test("IVF balance audit is partition-invariant") {
    invariantEmb(e =>
      Similarity.ivfBalanceAudit(e, e.filter(col("vec_id") < 16), dim = 64))
  }

  test("prefix recall audit is partition-invariant") {
    invariantEmb(e => Similarity.prefixRecallAudit(
      e.filter(col("vec_id") < 8), e, k = 5, dim = 64))
  }

  test("rp distortion audit is partition-invariant") {
    invariantEmb(e => Similarity.rpDistortionAudit(
      e.filter(col("vec_id") < 8), e, kDim = 16, dim = 64))
  }

  test("NB quality classifier is partition-invariant") {
    // model sheet, priors and normalizers all retrain from the
    // permuted corpus: the WHOLE split→train→score chain must be a
    // pure function of the data
    invariant(Classifier.nbQualityScores(_,
      col("source").isin("src0", "src1", "src2", "src3", "src4")))
  }

  test("quality keep-set is partition-invariant") {
    invariant { docs =>
      val pairs = Dedup.nearDupPairs(docs).select("a_id", "b_id")
        .union(Dedup.simhashNearDupPairs(docs, maxHamming = 5).select("a_id", "b_id"))
      val scored = docs.filter(col("doc_id").isNotNull).select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(
          coalesce(col("text"), lit(""))).as("n_tokens"))
      ConnectedComponents.keepBestFromComponents(scored, "doc_id", "n_tokens",
        ConnectedComponents.components(pairs))
    }
  }

  test("semantic contamination report is partition-invariant") {
    // the q138 shape: centroids retrain from the permuted corpus too —
    // the WHOLE split→train→probe→flag chain must be a pure function
    // of the data
    invariantEmb { e =>
      val train = Sampling.withSplitBucket(e, "vec_id")
        .filter(col("__bucket") >= 100).drop("__bucket")
      val refined = Similarity.kmeansIterate(train,
        train.filter(col("vec_id") < 16), iters = 2, dim = 64)
      // 0.35 (the q114 near-dup line) rather than q138's 0.5: the
      // sf0.001 fixture has no pairs at 0.5 and the pin needs a
      // non-empty sheet to bite on
      Decontaminate.semanticContaminationReport(e, refined,
        threshold = 0.35, nprobe = 4, evalPermille = 100, dim = 64)
    }
  }

  test("SQ8 audit is partition-invariant") {
    invariantEmb(Similarity.sqAudit(_, dim = 64))
  }

  test("IVFADC+R re-rank is partition-invariant") {
    // codebooks, cells and centroids all derive from the permuted
    // corpus: the WHOLE train→encode→probe→re-rank chain must be a
    // pure function of the data
    invariantEmb { e =>
      val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
      val codes = Similarity.pqEncode(e, cb, m = 4, dim = 64)
      val cent = e.filter(col("vec_id") < 16)
      val cells = Similarity.ivfAssign(e, cent, dim = 64).select(col("n_id"), col("c_id"))
      Similarity.ivfAdcRerankTopK(e.filter(col("vec_id") < 8), e, codes,
        cells, cent, cb, k = 5, shortlist = 15, nprobe = 4, m = 4, dim = 64)
    }
  }

  test("PQ encode is partition-invariant") {
    // codebooks retrain from the permuted corpus too: the WHOLE
    // train→encode chain must be a pure function of the data
    invariantEmb { e =>
      Similarity.pqEncode(e,
        Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64), m = 4, dim = 64)
    }
  }

  test("PQ ADC top-k is partition-invariant") {
    invariantEmb { e =>
      val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
      val codes = Similarity.pqEncode(e, cb, m = 4, dim = 64)
      Similarity.pqAdcTopK(e.filter(col("vec_id") < 8), codes, cb, k = 5, m = 4, dim = 64)
    }
  }

  test("DSIR resample + composition are partition-invariant") {
    invariant(Mixing.dsirResample(_, budgetPermille = 250))
    invariant(Mixing.resampleComposition(_, budgetPermille = 250))
  }

  test("feed policy verdicts and the acted corpus are partition-invariant") {
    val pos = col("source").isin("src0", "src1", "src2", "src3", "src4")
    invariant(Ensemble.feedPolicy(_, pos))
    invariant(Ensemble.applyFeedPolicy(_, pos))
  }

  test("token-budget resample is partition-invariant") {
    invariant(Mixing.dsirResampleTokens(_, tokenBudgetPermille = 250))
  }

  test("policy operating points are partition-invariant") {
    val pos = col("source").isin("src0", "src1", "src2", "src3", "src4")
    invariant(Ensemble.feedPolicyOperatingPoints(_, pos))
  }

  test("policy-release capstone inputs are partition-invariant") {
    // the release chain itself is q71's already-pinned machinery; the
    // NEW composition seam is the acted corpus feeding it — pin that
    // the act's output set survives arbitrary repartitioning (the
    // chain is deterministic given a set-equal input)
    val pos = col("source").isin("src0", "src1", "src2", "src3", "src4")
    invariant(d => Ensemble.applyFeedPolicy(d, pos)
      .select(col("doc_id"), col("source"), col("lang")))
  }

  test("resample budget sweep is partition-invariant") {
    invariant(Mixing.resampleBudgetSweep(_))
  }

  test("resample-release capstone inputs are partition-invariant") {
    // the release chain is q71's already-pinned machinery; the NEW
    // composition seam is the importance keep-set selecting the
    // corpus — pin that the joined frame survives repartitioning
    invariant(d => d.join(
      Mixing.dsirResample(d, budgetPermille = 250).select(col("doc_id")),
      "doc_id"))
  }

  test("DSIR model row and cut row are partition-invariant") {
    invariant(d => Mixing.dsirModelRow(d)
      .select(expr("CAST(map_entries(lrmap) AS STRING)"), col("lr0_q")))
    invariant(Mixing.resampleCutRow(_, budgetPermille = 250))
  }

  test("interleave manifest and mix audit are partition-invariant") {
    def pop(d: DataFrame): DataFrame = d.select(col("doc_id"), col("source"),
      graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
        .as("n_tokens"))
    invariant(d => Mixing.interleaveManifest(pop(d), "doc_id", "source",
      "n_tokens", budget = 1200L))
    invariant(d => Mixing.interleaveMixAudit(pop(d), "doc_id", "source",
      "n_tokens", budget = 1200L, nBlocks = 16))
  }

  test("epoch plan sheet is partition-invariant") {
    invariant(d => Mixing.epochPlanSheet(d.select(col("source"),
      graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
        .as("n_tokens")), "source", "n_tokens", budgetTokens = 110000L))
  }

  test("interleaved shard manifest is partition-invariant") {
    invariant(d => SequencePack.interleavedShardManifest(
      Mixing.interleaveManifest(d.select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
          .as("n_tokens")), "doc_id", "source", "n_tokens", budget = 1200L),
      "source", capacity = 2048L, packsPerShard = 16L))
  }

  test("policy-to-training-order capstone is partition-invariant") {
    val pos = col("source").isin("src0", "src1", "src2", "src3", "src4")
    invariant(d => SequencePack.interleavedShardManifest(
      Mixing.cappedInterleaveManifest(Ensemble.applyFeedPolicy(d, pos)
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
            .as("n_tokens")), "doc_id", "source", "n_tokens", budget = 1200L,
        maxEpochs64 = 256L),
      "source", capacity = 2048L, packsPerShard = 16L))
  }

  test("capped interleave manifest is partition-invariant") {
    invariant(d => Mixing.cappedInterleaveManifest(
      d.select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
          .as("n_tokens")),
      "doc_id", "source", "n_tokens", budget = 2000L, maxEpochs64 = 256L))
  }

  test("phased mix audit is partition-invariant") {
    invariant { d =>
      val phases = Phrases.lmQualityBuckets(d, "text")
        .select(col("doc_id"),
          when(col("bucket") === "tail", 0L)
            .when(col("bucket") === "middle", 1L)
            .when(col("bucket") === "head", 2L).as("phase"))
        .filter(col("phase").isNotNull)
      Mixing.phasedMixAudit(
        d.join(phases, "doc_id").select(col("doc_id"), col("source"),
          col("phase"),
          graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
            .as("n_tokens")),
        "doc_id", "source", "n_tokens", "phase", nPhases = 3,
        budget = 1200L, nBlocks = 8)
    }
  }

  test("capped curriculum interleave is partition-invariant") {
    invariant { d =>
      val phases = Phrases.lmQualityBuckets(d, "text")
        .select(col("doc_id"),
          when(col("bucket") === "tail", 0L)
            .when(col("bucket") === "middle", 1L)
            .when(col("bucket") === "head", 2L).as("phase"))
        .filter(col("phase").isNotNull)
      Mixing.cappedPhasedInterleave(
        d.join(phases, "doc_id").select(col("doc_id"), col("source"),
          col("phase"),
          graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
            .as("n_tokens")),
        "doc_id", "source", "n_tokens", "phase", nPhases = 3,
        budget = 1500L, maxEpochs64 = 256L)
    }
  }

  test("interleave increment is partition-invariant") {
    invariant { d =>
      val docs = d.select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
          .as("n_tokens"))
      val flagged = Sampling.withSplitBucket(docs, "doc_id")
      Mixing.interleaveIncrement(
        flagged.filter(col("__bucket") >= 100).drop("__bucket"),
        flagged.filter(col("__bucket") < 100).drop("__bucket"),
        "doc_id", "source", "n_tokens", budget = 500L)
    }
  }

  test("curriculum phased interleave is partition-invariant") {
    invariant { d =>
      val phases = Phrases.lmQualityBuckets(d, "text")
        .select(col("doc_id"),
          when(col("bucket") === "tail", 0L)
            .when(col("bucket") === "middle", 1L)
            .when(col("bucket") === "head", 2L).as("phase"))
        .filter(col("phase").isNotNull)
      Mixing.phasedInterleave(
        d.join(phases, "doc_id").select(col("doc_id"), col("source"),
          col("phase"),
          graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
            .as("n_tokens")),
        "doc_id", "source", "n_tokens", "phase", nPhases = 3, budget = 1200L)
    }
  }

  test("cluster-balanced sample is partition-invariant") {
    val e = Tables.embeddings(spark, sf001)
    val cents = e.filter(col("vec_id") < 16)
    val base = rows(Similarity.clusterBalancedSample(e, cents, budget = 137L))
    assert(base.nonEmpty)
    assert(rows(Similarity.clusterBalancedSample(e.repartition(7), cents,
      budget = 137L)) == base, "7-way hash repartition")
    assert(rows(Similarity.clusterBalancedSample(
      e.orderBy(col("vec_id").desc), cents, budget = 137L)) == base,
      "reordered input")
    val sheetBase = rows(Similarity.clusterBalancedSampleSheet(e, cents,
      budget = 137L))
    assert(sheetBase.nonEmpty)
    assert(rows(Similarity.clusterBalancedSampleSheet(e.repartition(7), cents,
      budget = 137L)) == sheetBase, "sheet: 7-way hash repartition")
  }

  test("incremental cluster sample is partition-invariant") {
    val e = Tables.embeddings(spark, sf001)
    def run(d: DataFrame): DataFrame = {
      val flagged = Sampling.withSplitBucket(d, "vec_id")
        .withColumn("is_new", col("__bucket") < 100).drop("__bucket")
      Similarity.incrementalClusterSample(flagged, "is_new",
        flagged.filter(!col("is_new") && col("vec_id") < 16), budget = 137L)
    }
    val base = rows(run(e))
    assert(base.nonEmpty)
    assert(rows(run(e.repartition(7))) == base, "7-way hash repartition")
    assert(rows(run(e.orderBy(col("vec_id").desc))) == base, "reordered input")
  }

  test("lang-ID apply, abstain sheet and dist drift are partition-invariant") {
    invariant(LangId.applyLangId(_, marginThresholdQ = 5000L))
    invariant(LangId.langIdOperatingPoints(_))
    invariant(LangId.langDistDrift(_))
    invariant(LangId.langDistDriftBySource(_))
    invariant(LangId.langKlBySource(_))
    invariant(Phrases.lmQualityBucketsByLang(_))
  }

  test("capped audits, capped increment and the resample-order capstone are partition-invariant") {
    def items(d: DataFrame): DataFrame = d.select(col("doc_id"), col("source"),
      graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
        .as("n_tokens"))
    invariant(d => Mixing.cappedInterleaveMixAudit(items(d), "doc_id",
      "source", "n_tokens", budget = 200L, nBlocks = 4))
    invariant { d =>
      val flagged = Sampling.withSplitBucket(items(d), "doc_id")
      Mixing.cappedInterleaveIncrement(
        flagged.filter(col("__bucket") >= 100).drop("__bucket"),
        flagged.filter(col("__bucket") < 100).drop("__bucket"),
        "doc_id", "source", "n_tokens", budget = 200L)
    }
    invariant { d =>
      Mixing.cappedPhasedMixAudit(
        items(d).withColumn("phase", col("doc_id") % 2),
        "doc_id", "source", "n_tokens", "phase", nPhases = 2,
        budget = 200L, nBlocks = 4)
    }
    invariant { d =>
      val kept = d.join(
        Mixing.dsirResample(d, budgetPermille = 250).select(col("doc_id")),
        "doc_id")
      SequencePack.interleavedShardManifest(
        Mixing.cappedInterleaveManifest(items(kept), "doc_id", "source",
          "n_tokens", budget = 200L),
        "source", capacity = 256L, packsPerShard = 4L)
    }
  }

  test("lang model increment, lang release act and curriculum shards are partition-invariant") {
    invariant { d =>
      val flagged = Sampling.withSplitBucket(d, "doc_id", "arrivals")
      LangId.langIdModelIncrement(
        flagged.filter(col("__bucket") >= 100).drop("__bucket"),
        flagged.filter(col("__bucket") < 100).drop("__bucket"))
    }
    invariant(d => LangId.actOnLangId(d, marginThresholdQ = 5000L)
      .select(col("doc_id"), col("lang")))
    invariant { d =>
      val phased = d.select(col("doc_id"), col("source"),
        (col("doc_id") % 3).as("phase"),
        graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
          .as("n_tokens"))
      SequencePack.phasedShardManifest(
        Mixing.cappedPhasedInterleave(phased, "doc_id", "source",
          "n_tokens", "phase", nPhases = 3, budget = 300L,
          maxEpochs64 = 256L),
        "source", capacity = 256L, packsPerShard = 4L, nPhases = 3)
    }
  }
}
