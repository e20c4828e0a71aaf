package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language identification — the FIRST gate the CCNet acquisition
  * line applies (Wenzek et al. 2020 run fastText lang-ID before any
  * quality filtering): derive a document's language from its TEXT
  * instead of trusting an upstream label. The per-(source, lang)
  * sheets downstream (q76/q118) consume a `lang` column; this
  * operator is where a real pipeline mints it.
  *
  * Model: closed-form multinomial Naive Bayes over hashed CHARACTER
  * TRIGRAMS — char n-grams are the classic lang-ID feature (Cavnar &
  * Trenkle 1994; fastText's lang-ID ships char n-grams too) because
  * they survive domains where word features fail (no segmentation,
  * short strings, mixed scripts). NB with hashed n-gram features is
  * the [[Classifier]] kernel lifted from 2 classes to K: per class c,
  * `score_q(d, c) = log2q(n_c + 1) + Σ_b occ_b·log2q(cnt_bc + 1)
  * − n_grams_d·log2q(t_c + B)` — exactly the +1-smoothed multinomial
  * log-joint with the corpus-constant normalizer dropped (constant
  * across classes, so argmax and margins are unchanged). `predicted
  * = argmax_c score_q`, ties by class name ascending; `margin_q` is
  * best − second (0 with a single class) — the abstain knob a
  * deployment thresholds (CCNet drops low-confidence lang-ID rows).
  *
  * Determinism design (the [[Classifier]]/q126 conventions): features
  * are md5-48 hashed trigrams of `lower(text)` mod `buckets`; the
  * train/apply split is the standing md5 split
  * ([[Sampling.withSplitBucket]] — train = first `trainPermille`
  * buckets, scored = the REST); counts are BIGINTs; every log is
  * [[Mixing.log2qExpr]] (1/64-log2 fixed point); both engines count
  * string positions in code points. Bitwise-oracled end to end
  * (q181). NULL labels train and score as the literal 'unknown' (the
  * q76 idiom); docs with NULL text or < 3 characters carry no
  * features and score prior-only; an EMPTY train split has no
  * classes and predicts nothing — audit before gating, like every
  * standing model.
  *
  * Scale shape (100 TB): trigrams assemble map-side
  * (`transform(sequence(...))`, no join) and collapse onto
  * (doc, bucket) count keys — the only corpus-sized exchanges are
  * keyed on doc_id: the (doc, bucket) collapse, the (doc, class)
  * feature sum, and the docs×K argmax window (24-byte rows, K =
  * observed languages). The model sheet is ≤ buckets×K rows and the
  * class-constants frame K rows — both BROADCAST (the persisted
  * artifact a production system ships to ingest workers). */
object LangId {

  /** Per held-out doc: `(doc_id, lang, n_grams, predicted_lang,
    * margin_q)` — `lang` the labeled (actual) class, 'unknown' for
    * NULL. */
  def langIdScores(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame = {
    val (meta, hb, consts, sheet) =
      parts(docs, textCol, langCol, trainPermille, buckets, salt)
    val nf = hb.filter(!col("__train"))
      .groupBy(col("doc_id")).agg(sum(col("occ")).as("__nf"))
    val sf = hb.filter(!col("__train")).select(col("doc_id"), col("b"), col("occ"))
      .join(broadcast(sheet), Seq("b"))
      .groupBy(col("doc_id"), col("__c"))
      .agg(sum(col("occ") * col("lg_q")).as("s_feat"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_q").desc, col("__c").asc)
    meta.filter(!col("__train")).select(col("doc_id"), col("__lang"))
      .join(nf, Seq("doc_id"), "left")
      .crossJoin(broadcast(consts))
      .join(sf, Seq("doc_id", "__c"), "left")
      .select(col("doc_id"), col("__lang").as("lang"), col("__c"),
        coalesce(col("__nf"), lit(0L)).as("n_grams"),
        (col("prior_q") + coalesce(col("s_feat"), lit(0L))
          - coalesce(col("__nf"), lit(0L)) * col("tlog_q")).as("score_q"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nxt", lead(col("score_q"), 1).over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang"), col("n_grams"),
        col("__c").as("predicted_lang"),
        (col("score_q") - coalesce(col("__nxt"), col("score_q")))
          .as("margin_q"))
  }

  /** The held-out CONFUSION sheet over [[langIdScores]] — the q143
    * evidence convention for the multi-class member: one row per
    * (labeled, predicted) pair with its doc count. The diagonal is
    * the per-language recall mass; a hot off-diagonal cell is either
    * a confusable language pair or (on labeled-by-provenance corpora)
    * a mislabeled feed — both worth reading before the q76/q118
    * sheets trust the label. Scale shape: [[langIdScores]]' audited
    * plan + ONE map-side-combined rollup onto ≤ K² keys. */
  def langIdConfusion(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame =
    langIdScores(docs, textCol, langCol, trainPermille, buckets, salt)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** The trained model collapsed to ONE broadcastable row —
    * `(classes, priors, tlogs, lgmaps)`: the sorted class list, the
    * per-class prior and normalizer maps, and per class the
    * (bucket → log-count) map — what a production system persists as
    * the lang-ID artifact and ships to ingest workers (the
    * [[Classifier.nbModelRow]] convention lifted to K classes).
    * Single-sourced with [[langIdScores]]: both build from the same
    * split/feature/sheet chain, so the streaming gate's predictions
    * are bitwise the batch sheet's
    * ([[graft.streaming.Curation.langIdGate]];
    * StreamingLangIdGateSpec pins it). Byte-determinism: every map
    * builds from an explicitly sorted entry array — the inner bucket
    * maps via `array_sort`, the class-keyed outer maps via the sorted
    * class fold (structs carrying maps are not sort-orderable, so the
    * per-class rows sort by a custom key comparator before
    * `map_from_entries`). An empty or text-free train split yields
    * ONE row with empty classes — the gate then predicts NULL for
    * every arrival (audit before arming, like every standing
    * model). */
  def langIdModelRow(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame = {
    val (_, _, consts, sheet) =
      parts(docs, textCol, langCol, trainPermille, buckets, salt)
    val perClass = sheet.groupBy(col("__c"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("b"), col("lg_q"))))).as("m"))
    consts.join(perClass, Seq("__c"), "left")
      .agg(
        sort_array(collect_list(col("__c"))).as("classes"),
        map_from_entries(array_sort(
          collect_list(struct(col("__c"), col("prior_q"))))).as("priors"),
        map_from_entries(array_sort(
          collect_list(struct(col("__c"), col("tlog_q"))))).as("tlogs"),
        collect_list(struct(col("__c"),
          coalesce(col("m"),
            map_from_entries(expr("CAST(array() AS array<struct<b: bigint, lg_q: bigint>>)")))
            .as("m"))).as("__lg"))
      // struct<string, map> is not sort-orderable; a key-only
      // comparator sorts the entry array before map construction so
      // the persisted artifact is byte-deterministic
      .withColumn("lgmaps", map_from_entries(expr(
        """array_sort(__lg, (l, r) ->
          |  CASE WHEN l.__c < r.__c THEN -1
          |       WHEN l.__c > r.__c THEN 1 ELSE 0 END)""".stripMargin)))
      .select(col("classes"), col("priors"), col("tlogs"), col("lgmaps"))
  }

  /** The shared split → lowered text → hashed char-trigram →
    * per-(doc, bucket) count → model chain: returns
    * (meta, hb, consts, sheet). */
  private def parts(docs: DataFrame, textCol: String, langCol: String,
      trainPermille: Int, buckets: Int, salt: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(trainPermille >= 0 && trainPermille <= 1000,
      s"trainPermille must be in [0,1000], got $trainPermille")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val meta = Sampling.withSplitBucket(docs, "doc_id", salt)
      .select(col("doc_id"), lower(col(textCol)).as("__text"),
        coalesce(col(langCol), lit("unknown")).as("__lang"),
        (col("__bucket") < trainPermille).as("__train"))
    val t = col("__text")
    val base = meta.filter(t.isNotNull && length(t) >= 3)
      .select(col("doc_id"), col("__train"), col("__lang"),
        explode(transform(sequence(lit(1), length(t) - lit(2)),
          i => t.substr(i, lit(3)))).as("g"))
      .select(col("doc_id"), col("__train"), col("__lang"),
        (Dedup.md5Base48Of(md5(col("g"))) % buckets.toLong).as("b"))
    // hb feeds the model sheet, the class totals, AND both held-out
    // sums — materialized so the trigram pass runs once
    val hb = Dedup.materialize(
      base.groupBy(col("doc_id"), col("__train"), col("__lang"), col("b"))
        .agg(count(lit(1)).as("occ")))
    // per-class constants: doc prior over text-bearing train docs,
    // normalizer over the class's train feature mass
    val consts = meta.filter(col("__train") && col("__text").isNotNull)
      .groupBy(col("__lang").as("__c")).agg(count(lit(1)).as("n_c"))
      .join(hb.filter(col("__train"))
        .groupBy(col("__lang").as("__c")).agg(sum(col("occ")).as("t_c")),
        Seq("__c"), "left")
      .select(col("__c"),
        expr(Mixing.log2qExpr("n_c + 1")).as("prior_q"),
        expr(Mixing.log2qExpr(s"coalesce(t_c, 0) + $buckets")).as("tlog_q"))
    // the (bucket, class) model sheet; absent cells contribute the
    // mathematically-correct 0 (= log2q(0 + 1))
    val sheet = hb.filter(col("__train"))
      .groupBy(col("b"), col("__lang").as("__c"))
      .agg(sum(col("occ")).as("cnt"))
      .select(col("b"), col("__c"),
        expr(Mixing.log2qExpr("cnt + 1")).as("lg_q"))
    (meta, hb, consts, sheet)
  }
}
