#!/bin/bash
# Dev-only: regenerate PLANS.md (formatted physical plans of headline queries).
set -e
cd /root/repo
/opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  --driver-class-path target/scala-2.13/classes <<'EOF'
import java.io.PrintWriter
graft.GraftSession.ensureConfs(spark)
val d = "/root/testdata/sf0.01"
val picks = Seq("q01_agg_pricing_summary","q03_filter_pushdown","q04_join_revenue_by_nation",
  "q08_window_topk_per_group","q20_upsert_lww","q28_dedup_minhash_lsh","q30_cosine_topk","q33_window_tumbling",
  "q46_ann_topk","q47_simhash_neardup","q48_salted_agg","q49_ivf_topk","q50_embedding_neardup_lsh","q52_asof_join","q53_range_join",
  "q58_neardup_clusters","q60_multi_quantile","q61_unicode_normalize","q62_event_sequences","q63_session_cooccurrence","q64_rolling_features","q65_sequence_packing","q66_decontamination","q68_incremental_dedup","q71_corpus_build","q72_repetition_stats","q73_intra_doc_repetition","q74_filter_audit","q81_curation_gate","q82_ivf_drift","q83_repeated_spans","q85_funnel_analysis","q87_feature_correlation","q88_conversion_by_cohort","q89_mixing_weights","q90_event_anomaly","q91_bigram_phrases","q92_vocab_drift","q93_vocab_growth","q94_embedding_audit","q95_source_overlap","q96_source_curation","q97_doc_novelty","q98_sampling_allocation","q99_shard_manifest","q100_corpus_datasheet","q101_allocation_sample","q102_allocation_epochs","q103_snapshot_diff","q104_cluster_safe_split","q105_incremental_clusters","q106_bpe_pair_stats","q107_span_scrub","q108_release_bundle","q109_bpe_merge_delta","q110_bpe_encode","q111_paragraph_neardup","q112_paragraph_scrub","q113_semantic_dedup","q114_incremental_semantic_dedup",
  "q115_boilerplate_scrub","q116_bloom_decontaminate","q117_ann_recall_audit","q118_bpe_fertility","q119_incremental_boilerplate","q120_winnow_matches","q121_eval_contamination",
  "q122_minhash_recall_audit","q123_unigram_lm_round","q124_unigram_encode","q125_lm_quality_buckets","q126_dsir_weights","q127_embedding_pca",
  "q128_embedding_whiten","q129_pq_codes","q130_pq_adc_topk","q131_pq_recall_audit","q132_ivfadc_topk","q133_pq_residual_codes",
  "q134_bm25_retrieval","q135_rrf_fusion","q136_oov_audit","q137_bigram_lm_quality",
  "q138_semantic_contamination","q139_sq8_audit","q140_quality_keepset","q141_filter_overlap","q142_ivfadc_rerank","q143_quality_classifier","q144_length_psi","q145_source_overlap","q146_ivf_balance","q147_classifier_pr","q148_classifier_calibration","q149_prefix_recall","q150_gate_agreement","q151_rp_distortion","q152_zipf_audit","q153_gate_rates_by_source","q154_dup_rates_by_source","q155_source_kl_fingerprint","q156_source_length_psi","q157_label_separation","q158_content_kl_drift","q159_source_scorecard","q160_dup_profile","q161_dsir_resample","q162_feed_policy","q163_resample_mix","q164_policy_act","q165_token_budget_resample","q166_policy_operating_points","q167_policy_release","q168_resample_budget_sweep","q169_resample_release","q170_interleave_manifest","q171_interleave_mix_audit","q172_cluster_balanced_sample","q173_epoch_plan","q174_interleaved_shards","q175_cluster_sample_sheet","q176_policy_training_order","q177_curriculum_order","q178_incremental_cluster_sample","q179_capped_interleave","q180_curriculum_mix_audit","q181_langid_confusion","q182_interleave_increment","q183_capped_curriculum",
  "q184_langid_apply","q185_langid_abstain_sheet","q186_capped_mix_audit","q187_capped_curriculum_audit","q188_langid_drift","q189_resample_training_order","q190_capped_increment","q191_langid_composition","q192_langid_drift_by_source",
  "q193_lang_kl_by_source","q194_lang_quality_buckets","q195_langid_model_increment","q196_lang_release","q197_curriculum_shards")
// Normalize session-volatile ids (expression #ids, exchange plan_ids)
// to per-plan first-appearance ordinals so regenerated PLANS.md diffs
// show only REAL plan changes, not ~30k lines of id churn per round.
def normalizeIds(plan: String): String = {
  val exprIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
  val step1 = "#(\\d+)".r.replaceAllIn(plan,
    m => "#" + exprIds.getOrElseUpdate(m.group(1), exprIds.size + 1))
  val planIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
  "plan_id=(\\d+)".r.replaceAllIn(step1,
    m => "plan_id=" + planIds.getOrElseUpdate(m.group(1), planIds.size + 1))
}
val sb = new StringBuilder
sb ++= "# PLANS -- physical plans of headline queries (sf0.01, local[8])\n\n"
sb ++= "Generated from `df.explain(\"formatted\")` via spark-shell; regenerate with tools/gen_plans.sh.\n"
sb ++= "Expression #ids and plan_ids are normalized to per-plan ordinals by the generator.\n"
for (name <- picks) {
  val df = graft.SparkEntry.queries(name)(spark, d)
  val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  sb ++= s"\n## $name\n\n```\n" ++= normalizeIds(plan) ++= "\n```\n"
}
new PrintWriter("/root/repo/PLANS.md") { write(sb.toString); close() }
EOF
