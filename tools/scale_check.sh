#!/bin/bash
# Dev-only: measure wall time + shuffle bytes of the shingle/CC family
# (q58/q59/q71/q108) and the census/probe family (q115/q116/q119) over
# the inflated corpora from gen_scale_corpus.py, at x1/x4/x8 the sf0.1
# document count. Emits SCALE lines; SCALE.md is written from them by
# hand (the measurement is the artifact, prose is cheap). Run idle —
# contention inflates everything.
set -e
cd /root/repo
/opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --driver-memory 24g \
  --driver-class-path target/scala-2.13/classes <<'EOF'
import org.apache.spark.scheduler._
@volatile var shufW = 0L
@volatile var shufR = 0L
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
    shufW += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    shufR += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
  }
})
graft.GraftSession.ensureConfs(spark)
spark.range(1000000).selectExpr("sum(id)").collect()  // session warmup
val allNames = Seq("q58_neardup_clusters", "q59_dedup_keepset",
  "q71_corpus_build", "q108_release_bundle",
  "q115_boilerplate_scrub", "q116_bloom_decontaminate",
  "q119_incremental_boilerplate",
  // round-10 families (documents + embeddings corpora both live in
  // the same xK dirs): banded recall audit, unigram train/apply/
  // quality, DSIR, power-iteration PCA
  "q122_minhash_recall_audit", "q123_unigram_lm_round",
  "q124_unigram_encode", "q125_lm_quality_buckets",
  "q126_dsir_weights", "q127_embedding_pca",
  // round-11: df-capped BM25 retrieval (documents), RRF fusion of the
  // three ANN arms (embeddings), OOV audit + bigram LM (documents)
  "q134_bm25_retrieval", "q135_rrf_fusion",
  "q136_oov_audit", "q137_bigram_lm_quality",
  // round-11 (3): quality-aware keeper (documents; re-pays the q58
  // cells — the claim is the keeper adds only cluster-keyed work)
  "q140_quality_keepset",
  // round-11 close: supervised classifier + calibration (documents;
  // the claim is hashed-bigram count rows are the only exchange),
  // PSI monitor (one length exchange), the cross-family agreement
  // composite (three kernels, doc_id-keyed decision joins), and the
  // zipf fit (one term exchange + vocab sort)
  "q143_quality_classifier", "q144_length_psi", "q147_classifier_pr",
  "q148_classifier_calibration", "q150_gate_agreement",
  "q152_zipf_audit",
  // round-11 (4): the acquisition-level ablation family (documents;
  // q153 re-pays the three quality kernels, q154 the q58 cells -- the
  // claims are sources-sized rollups on top) and the vector-side
  // label audit (embeddings; one (label, dim)-keyed exchange)
  "q153_gate_rates_by_source", "q154_dup_rates_by_source",
  "q155_source_kl_fingerprint", "q156_source_length_psi",
  "q157_label_separation",
  // round-12: the three round-11 capstones (q158 = one KL probe on the
  // split; q159 re-pays its four members -- the claim is wall ~ their
  // sum and shuffle ~ theirs, any excess = the broadcast-left-join
  // layer leaking an exchange; q160 the q58 cells + two node-frame
  // rollups) and the round-12 apply members (q161/q163 re-pay q126
  // plus ONE narrow-row percentile pass; q162 re-pays q159 plus a
  // map-side CASE)
  "q158_content_kl_drift", "q159_source_scorecard", "q160_dup_profile",
  "q161_dsir_resample", "q162_feed_policy", "q163_resample_mix",
  // q164 re-pays q162 plus the corpus-side broadcast act (map-side
  // bucket filter -- the claim is shuffle == q162's own)
  "q164_policy_act",
  // q165 re-pays q126 + the map-side keys; round 13 distributed its
  // prefix: the budget boundary is radix-LOCATED (4 map-side histogram
  // passes) and only the boundary tie group windows. q161/q163's cut
  // likewise became radix select -- the claim for all three is shuffle
  // ~ q126's plus sheet-sized histogram cells, with NO task reading
  // corpus-sized input
  "q165_token_budget_resample",
  // round-13: the policy operating-point sweep (re-pays q159 once,
  // then sheet-sized deciles x grid) and the policy->release capstone
  // (q164's act feeding the whole q71 chain -- the claim is cost ~
  // q162 evidence + q71-on-the-smaller-acted-corpus)
  "q166_policy_operating_points", "q167_policy_release",
  // q168 re-pays the q161 scored chain; the nine cuts share the radix
  // kernel's four passes and the sweep is ONE map-side pass (nested
  // kept-sets classify each row once) -- the claim is shuffle == the
  // q161 family's own bytes
  "q168_resample_budget_sweep",
  // q169 re-pays q161 once, then the q71 chain over the kept corpus --
  // the claim is cost ~ q161 + q71-on-the-smaller-resampled-corpus
  "q169_resample_release",
  // round-13 widening: the interleave manifest re-pays the q102 plan
  // (pruned quota pass + ONE group-key ranking shuffle) with map-side
  // key arithmetic on top -- the claim is NO global sort and shuffle
  // ~ q102's; the audit adds one (block, source) rollup over the
  // budget-bounded manifest
  "q170_interleave_manifest", "q171_interleave_mix_audit",
  // the cluster-balanced sample re-pays the ivfAssign argmax (one
  // exchange row per vector) + one cell-keyed ranking shuffle; the
  // epoch plan is exactly q98's plan (corpus agg + sheet windows)
  "q172_cluster_balanced_sample", "q173_epoch_plan","q174_interleaved_shards","q175_cluster_sample_sheet","q176_policy_training_order","q177_curriculum_order","q178_incremental_cluster_sample",
  // round-14: the capped interleave re-pays the q170 plan plus
  // sheet-only fixpoint rounds (the claim: shuffle ~ q170's own, the
  // fixed round cost does not scale with the corpus); the curriculum
  // audit adds one (phase, block, source) rollup over q177's plan;
  // langid's only corpus exchanges are doc_id-keyed (trigram count
  // rows + the docsxK argmax window); the increment's only exchange
  // is the BATCH's cohort rank (the standing corpus pays one pruned
  // quota agg and is never re-keyed)
  "q179_capped_interleave", "q180_curriculum_mix_audit",
  "q181_langid_confusion", "q182_interleave_increment",
  // the capped curriculum re-pays q177 (the claim: shuffle ~ q177 own,
  // the per-phase fixpoint is sheet-only)
  "q183_capped_curriculum",
  // round-15: the apply re-pays the q181 model build (train-slice
  // exchanges only) and the act itself is a broadcast ride on the
  // corpus scan (the claim: shuffle ~ the model build's own, corpus
  // never re-keys); the abstain sheet adds the 17-byte margin frame +
  // radix deciles; the drift monitor's scoring passes are broadcast
  // rides into <= K-key rollups; the capped audits re-pay q179/q183
  // plus sheet rollups; the capped increment re-pays the capped quota
  // fixpoint with ONE batch-sized exchange; the resample->order
  // capstone re-pays q161 + the capped chain on the kept corpus
  "q184_langid_apply", "q185_langid_abstain_sheet",
  "q186_capped_mix_audit", "q187_capped_curriculum_audit",
  "q188_langid_drift", "q189_resample_training_order",
  "q190_capped_increment",
  // round-15 (2): the composition re-pays q184 + one doc_id join +
  // a sources x (K+1) rollup; the by-source drift re-pays q188 +
  // one arrival-sized doc_id join + a (source, class) rollup
  "q191_langid_composition", "q192_langid_drift_by_source",
  // round-16: the lang-KL member re-pays q184's scoring once into a
  // materialized sources x K counts sheet (the claim: shuffle ~ the
  // scoring chain's own, every close a window over that sheet); the
  // per-lang buckets re-pay q184 + the q125 unigram chain with keys
  // widened to (lang, .) + grouped radix cuts (sheet-sized histogram
  // cells); the model increment pays the two train-slice trigram
  // collapses and sheet-sized folds ONLY (no corpus re-key); the
  // lang release re-pays q184 + the q71 chain on the SMALLER kept
  // corpus; the curriculum shards re-pay q183 + the two-level pack
  // kernel with (phase, bucket) keys
  "q193_lang_kl_by_source", "q194_lang_quality_buckets",
  "q195_langid_model_increment", "q196_lang_release",
  "q197_curriculum_shards")
// SCALE_ONLY=q123,q126 restricts the sweep (re-measuring one family
// without re-paying the shingle/CC cells)
val names = sys.env.get("SCALE_ONLY").map(f => allNames.filter(f.split(",").map(_.trim).toSet)).getOrElse(allNames)
for (scale <- Seq("x1", "x4", "x8"); name <- names) {
  val dir = s"/tmp/graft_scale/$scale"
  def once(): Double = {
    val t0 = System.nanoTime
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    (System.nanoTime - t0) / 1e9
  }
  val t1 = once()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  Thread.sleep(1500); shufW = 0L; shufR = 0L
  val t2 = once()
  Thread.sleep(1500)  // let listener events drain before reading counters
  println(f"SCALE $scale $name min=${math.min(t1, t2)}%.3f shufW_MB=${shufW / 1048576.0}%.1f shufR_MB=${shufR / 1048576.0}%.1f")
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
}
System.exit(0)
EOF
