package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Degenerate-input behavior of the dedup/similarity operators — the
  * shapes a 100 TB pipeline WILL hit somewhere in some partition: empty
  * frames, single rows, documents too short to shingle, null vectors. */
class EdgeCasesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup operators return empty results on empty input (no crash, no rows)") {
    assert(Dedup.exactGroups(noDocs).count() == 0)
    assert(Dedup.nearDupPairs(noDocs).count() == 0)
    assert(Dedup.simhashNearDupPairs(noDocs).count() == 0)
    assert(Dedup.embeddingNearDupPairsLsh(noVecs.withColumn("embedding",
      col("embedding").cast("array<float>")), 0.9, dim = 8).count() == 0)
  }

  test("similarity operators handle empty corpus/queries") {
    val someVecs = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.annTopK(someVecs, noVecs, 3).count() == 0)
    assert(Similarity.annTopK(noVecs, someVecs, 3).count() == 0)
    assert(Similarity.bruteForceTopK(noVecs, someVecs, 3).count() == 0)
    assert(Similarity.ivfTopK(noVecs, someVecs, someVecs, 3).count() == 0)
  }

  test("docs shorter than one 3-shingle produce no signature rows but survive the pipeline") {
    val docs = Seq((1L, "only two"), (2L, "one"), (3L, "")).toDF("doc_id", "text")
    assert(Dedup.shingleRows(docs).count() == 0)
    assert(Dedup.minhashSignatures(docs).count() == 0)
    assert(Dedup.nearDupPairs(docs).count() == 0)
    // simhash tokenizes (no shingling) so short docs DO sign — and two
    // one-token docs with the same token are hamming-0 near-dups
    val sigs = Dedup.simhashSignature(Seq((1L, "one"), (2L, "one")).toDF("doc_id", "text"))
    assert(sigs.count() == 2)
    assert(sigs.select("simhash").distinct().count() == 1)
  }

  test("single-document corpus yields no pairs anywhere") {
    val one = Seq((1L, (1 to 50).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.nearDupPairs(one).count() == 0)
    assert(Dedup.simhashNearDupPairs(one).count() == 0)
  }

  test("round-9 operators survive empty/null/degenerate corpora") {
    // bpeEncode: empty corpus exhausts training at merge 1 and still
    // returns a (zero-row) total frame; an all-null corpus returns the
    // doc base with zeros.
    assert(Phrases.bpeEncode(noDocs, "text").count() == 0)
    val nulls = Seq((1L, Option.empty[String]), (2L, None)).toDF("doc_id", "text")
    val z = Phrases.bpeEncode(nulls, "text").collect()
    assert(z.length == 2 && z.forall(r => r.getLong(1) == 0L && r.getLong(3) == 0L))
    // a corpus of only 1-char words trains zero merges (no pairs) but
    // still encodes: every word is its own symbol
    val ones = Seq((1L, "a b a")).toDF("doc_id", "text")
    val o = Phrases.bpeEncode(ones, "text").collect().head
    assert((o.getLong(1), o.getLong(2), o.getLong(3)) == ((3L, 3L, 3L)))

    // paragraph family: empty and null-text corpora produce no units,
    // no pairs, and a total scrub output
    assert(Dedup.tokenBlockParagraphs(noDocs).count() == 0)
    assert(Dedup.paragraphNearDupPairs(noDocs).count() == 0)
    assert(Dedup.scrubDupParagraphs(noDocs).count() == 0)
    val scrubNull = Dedup.scrubDupParagraphs(nulls).collect()
    assert(scrubNull.length == 2 &&
      scrubNull.forall(r => r.getString(1) == "" && r.getLong(2) == 0L && r.getLong(3) == 0L))

    // semantic dedup: empty corpus (dim uninferable) → zero rows, and a
    // single vector is trivially kept
    assert(Similarity.semanticDedup(noVecs, noVecs, 0.9).count() == 0)
    val oneVec = Seq((5L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(oneVec, oneVec, 0.9, dim = 2).collect()
    assert(kept.length == 1 && kept.head.getLong(2) == 1L)
  }

  test("census/probe operators survive empty/null/degenerate corpora") {
    val nulls = Seq((1L, Option.empty[String]), (2L, None)).toDF("doc_id", "text")

    // boilerplate scrubs: empty corpus → zero rows; all-null corpus →
    // total output with zeros; single doc can never cross minDocs >= 2
    assert(Dedup.scrubBoilerplateUnits(noDocs).count() == 0)
    val bNull = Dedup.scrubBoilerplateUnits(nulls).collect()
    assert(bNull.length == 2 &&
      bNull.forall(r => r.getString(1) == "" && r.getLong(2) == 0L && r.getLong(3) == 0L))
    val one = Seq((1L, (1 to 50).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.scrubBoilerplateUnits(one).agg(sum("n_dropped")).head.getLong(0) == 0L)

    // incremental: an empty batch is an empty output whatever the
    // standing side holds; an empty STANDING side degrades to the
    // batch-only census (== monolithic over the batch)
    val flagged = one.withColumn("is_new", lit(false))
    assert(Dedup.scrubBoilerplateIncrement(flagged, "is_new").count() == 0)
    val batchOnly = Seq((1L, "a b", true), (2L, "a b", true))
      .toDF("doc_id", "text", "is_new")
    assert(Dedup.scrubBoilerplateIncrement(batchOnly, "is_new", blockTokens = 2)
      .agg(sum("n_dropped")).head.getLong(0) == 2L)

    // bloom probe: empty corpus and a corpus whose docs are all too
    // short to shingle both yield an empty (not crashed) report
    assert(Decontaminate.bloomContaminationCandidates(noDocs).count() == 0)
    val short = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    assert(Decontaminate.bloomContaminationCandidates(short).count() == 0)

    // recall audit: empty query side → empty audit (the corpus side
    // empty is covered by the kernels' own guards)
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.annRecallAudit(noVecs, vecs, vecs, k = 3, dim = 2).count() == 0)

    // fertility sheet: all-null corpus aggregates to zero counts with
    // NULL ratios
    val fNulls = Seq((1L, Option.empty[String], "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val fr = Phrases.bpeFertilitySheet(fNulls, "text", numMerges = 1).collect().head
    assert(fr.getLong(3) == 0L && fr.isNullAt(6) && fr.isNullAt(7))
  }

  test("resample family is total on empty / null-text / single-doc corpora") {
    val empty = Seq.empty[(Long, Option[String], String)]
      .toDF("doc_id", "text", "source")
    assert(Mixing.dsirResample(empty, budgetPermille = 250).count() == 0)
    assert(Mixing.dsirResampleTokens(empty, tokenBudgetPermille = 250).count() == 0)
    assert(Mixing.resampleComposition(empty, budgetPermille = 250).count() == 0)

    // null texts carry zero bigrams (weight 0) but remain sampleable;
    // a single doc at budget 1000 keeps itself
    val nulls = Seq((1L, Option.empty[String], "a"),
      (2L, Option.empty[String], "b")).toDF("doc_id", "text", "source")
    assert(Mixing.dsirResample(nulls, budgetPermille = 1000).count() == 2)
    val one = Seq((7L, Option("a few words here"), "solo"))
      .toDF("doc_id", "text", "source")
    assert(Mixing.dsirResample(one, budgetPermille = 1000)
      .head().getLong(0) == 7L)
    // budget 500 of ONE doc: ceil(0.5*1) = rank 1 = the doc itself is
    // the cut, strict > keeps nothing — documented floor semantics
    assert(Mixing.dsirResample(one, budgetPermille = 500).count() == 0)
  }

  test("policy act is total when the verdict sheet is empty or disjoint") {
    val docs = Seq((1L, "some text", "feedx")).toDF("doc_id", "text", "source")
    val emptyVerdicts = Seq.empty[(String, String)].toDF("source", "verdict")
    // no verdicts at all: everything keeps (evidence-free rule)
    assert(Ensemble.actOnVerdicts(docs, emptyVerdicts).count() == 1)
    // a sheet about OTHER feeds: same
    val other = Seq(("feedy", "drop")).toDF("source", "verdict")
    assert(Ensemble.actOnVerdicts(docs, other).count() == 1)
    // and a drop verdict for the feed removes it
    val drop = Seq(("feedx", "drop")).toDF("source", "verdict")
    assert(Ensemble.actOnVerdicts(docs, drop).count() == 0)
    // null doc_ids never emit (no identity to damp-sample by)
    val nullId = Seq((Option.empty[Long], "t", "feedx"))
      .toDF("doc_id", "text", "source")
    assert(Ensemble.actOnVerdicts(nullId, emptyVerdicts).count() == 0)
  }

  test("interleave/epoch-plan/pack family is total on empty / degenerate inputs") {
    val empty = Seq.empty[(String, String, Long)]
      .toDF("doc_id", "source", "n_tokens")
    assert(Mixing.interleaveManifest(empty, "doc_id", "source", "n_tokens",
      budget = 100L).count() == 0)
    assert(Mixing.interleaveMixAudit(empty, "doc_id", "source", "n_tokens",
      budget = 100L).count() == 0)
    assert(Mixing.epochPlanSheet(empty, "source", "n_tokens",
      budgetTokens = 100L).count() == 0)
    assert(SequencePack.interleavedShardManifest(
      Mixing.interleaveManifest(empty, "doc_id", "source", "n_tokens", 100L),
      "source", capacity = 64L, packsPerShard = 2L).count() == 0)

    // a single one-doc source absorbs the whole budget: alloc = budget,
    // every epoch is that doc, positions cover the grid uniformly
    val one = Seq(("d1", "solo", 10L)).toDF("doc_id", "source", "n_tokens")
    val m = Mixing.interleaveManifest(one, "doc_id", "source", "n_tokens",
      budget = 5L).collect()
    assert(m.length == 5 && m.forall(_.getAs[String]("doc_id") == "d1"))
    assert(m.map(_.getAs[Long]("epoch")).sorted.toSeq == (0L until 5L))
    // one source -> every block reads share_q == target_q (dev 0)
    val audit = Mixing.interleaveMixAudit(one, "doc_id", "source",
      "n_tokens", budget = 5L, nBlocks = 4).collect()
    assert(audit.nonEmpty && audit.forall(_.getAs[Long]("dev_q") == 0L))

    // an ALL-zero-weight corpus allocates nothing (no evidence, no
    // seats — the ANSI-DIV-total branch in sqrtAllocation)
    val allZero = Seq(("d1", "s", 0L), ("d2", "s", 0L))
      .toDF("doc_id", "source", "n_tokens")
    assert(Mixing.interleaveManifest(allZero, "doc_id", "source",
      "n_tokens", 2L).count() == 0)
    assert(Mixing.sqrtAllocation(allZero, "source", "n_tokens", 2L)
      .collect().forall(_.getAs[Long]("alloc") == 0L))
    // a zero-token doc inside a source WITH mass packs zero-width but
    // still counts as an appearance
    val zero = Seq(("d1", "s", 0L), ("d2", "s", 10L))
      .toDF("doc_id", "source", "n_tokens")
    val sheet = SequencePack.interleavedShardManifest(
      Mixing.interleaveManifest(zero, "doc_id", "source", "n_tokens", 2L),
      "source", capacity = 64L, packsPerShard = 2L).collect()
    assert(sheet.map(_.getAs[Long]("n_appearances")).sum == 2L &&
      sheet.map(_.getAs[Long]("n_tokens")).sum == 10L)

    // cluster-balanced sample: empty corpus and empty centroid frame
    val noV = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val someV = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.clusterBalancedSample(noV, someV, budget = 5L,
      dim = 2).count() == 0)
    assert(Similarity.clusterBalancedSample(someV, noV, budget = 5L,
      dim = 2).count() == 0, "no centroids -> no cells -> nothing kept")
    assert(Mixing.epochPlanSheet(one, "source", "n_tokens",
      budgetTokens = 0L).collect().forall(r =>
        r.getAs[Long]("alloc_tokens") == 0L && r.getAs[Long]("capped") == 0L))
  }

  test("round-14 family is total on empty / degenerate inputs") {
    val empty = Seq.empty[(String, String, Long)]
      .toDF("doc_id", "source", "n_tokens")
    // capped allocation: empty corpus -> empty sheet (the fixpoint
    // terminates round 1 with no groups); zero budget allocates zero
    assert(Mixing.cappedAllocation(empty, "source", "n_tokens",
      budget = 100L).count() == 0)
    assert(Mixing.cappedInterleaveManifest(empty, "doc_id", "source",
      "n_tokens", budget = 100L).count() == 0)
    val one = Seq(("d1", "solo", 10L)).toDF("doc_id", "source", "n_tokens")
    assert(Mixing.cappedAllocation(one, "source", "n_tokens", budget = 0L)
      .collect().forall(r => r.getAs[Long]("alloc") == 0L &&
        r.getAs[Long]("capped") == 0L))
    // all-zero-weight corpus: nothing allocates, nothing caps
    val allZero = Seq(("d1", "s", 0L), ("d2", "s", 0L))
      .toDF("doc_id", "source", "n_tokens")
    assert(Mixing.cappedAllocation(allZero, "source", "n_tokens", 2L)
      .collect().forall(r => r.getAs[Long]("alloc") == 0L))
    assert(Mixing.cappedInterleaveManifest(allZero, "doc_id", "source",
      "n_tokens", 2L).count() == 0)

    // phased audit: empty corpus and out-of-range phases -> empty sheet
    val emptyP = Seq.empty[(String, String, Long, Long)]
      .toDF("doc_id", "source", "phase", "n_tokens")
    assert(Mixing.phasedMixAudit(emptyP, "doc_id", "source", "n_tokens",
      "phase", nPhases = 2, budget = 10L, nBlocks = 4).count() == 0)
    val badPhase = Seq(("d1", "s", 7L, 10L), ("d2", "s", -1L, 10L))
      .toDF("doc_id", "source", "phase", "n_tokens")
    assert(Mixing.phasedMixAudit(badPhase, "doc_id", "source", "n_tokens",
      "phase", nPhases = 2, budget = 10L, nBlocks = 4).count() == 0)

    // capped curriculum: empty corpus and out-of-range phases -> empty
    // manifest; zero budget allocates nothing
    assert(Mixing.cappedPhasedInterleave(emptyP, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 10L).count() == 0)
    assert(Mixing.cappedPhasedInterleave(badPhase, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 10L).count() == 0)
    val oneP = Seq(("d1", "s", 0L, 10L)).toDF("doc_id", "source", "phase", "n_tokens")
    assert(Mixing.cappedPhasedInterleave(oneP, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 0L).count() == 0)

    // interleave increment: empty standing corpus admits nothing
    // (no census); empty batch yields an empty disposition
    val batch = Seq(("n1", "s", 5L)).toDF("doc_id", "source", "n_tokens")
    val incEmptyStanding = Mixing.interleaveIncrement(empty, batch,
      "doc_id", "source", "n_tokens", budget = 10L).collect()
    assert(incEmptyStanding.length == 1 &&
      incEmptyStanding.forall(_.getAs[Long]("kept") == 0L))
    assert(Mixing.interleaveIncrement(one, empty, "doc_id", "source",
      "n_tokens", budget = 10L).count() == 0)

    // language ID: empty corpus -> empty scores and confusion; a
    // corpus whose TRAIN split has no text predicts nothing (no
    // classes — audit before gating, the standing-model rule)
    val emptyDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "lang")
    assert(LangId.langIdScores(emptyDocs).count() == 0)
    assert(LangId.langIdConfusion(emptyDocs).count() == 0)
    val noText = (1 to 6).map(i =>
      (i.toLong, null.asInstanceOf[String], "xx")).toDF("doc_id", "text", "lang")
    assert(LangId.langIdScores(noText).count() == 0,
      "classless model predicts nothing")
  }

  test("cappedAllocation pathological cascade: one group caps per round at the <= groups bound") {
    // the deepest cascade the fixpoint admits: equal-ish caps under a
    // K=8 weight staircase, so each round's Hamilton pushes exactly
    // the heaviest OPEN group over its cap and nothing else. 6 groups
    // of 1 doc (cap 4 each), masses 64^i -> s_q ratio 8:1 between
    // neighbors; budget 28 > Σ cap = 24, so the cascade runs the FULL
    // ≤ groups depth (6 capping rounds + the empty fixpoint probe —
    // the serialized-jobs worst case the scaladoc documents) and ends
    // all-capped with the stranded 4 reading off the sheet.
    val items = (0 to 5).map(i => (s"d$i", s"g$i", math.pow(64.0, i).toLong))
      .toDF("doc_id", "source", "n_tokens")
    val m = Mixing.cappedAllocation(items, "source", "n_tokens",
      budget = 28L, maxEpochs64 = 256L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("cap"), r.getAs[Long]("alloc"),
          r.getAs[Long]("capped")))).toMap
    // terminated (we got here), every group AT its cap, all flagged
    assert(m.size == 6)
    assert(m.values.forall { case (cap, alloc, capped) =>
      cap == 4L && alloc == 4L && capped == 1L })
    // conservation in the infeasible regime: Σ alloc = Σ cap < budget
    assert(m.values.map(_._2).sum == 24L, "stranded 4 = budget − Σ cap")
  }
}
