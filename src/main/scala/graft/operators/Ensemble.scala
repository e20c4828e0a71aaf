package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Agreement analysis across the three quality-gate FAMILIES the
  * engine ships — the ensemble readout the published pipelines tune
  * with (Dolma's rule cascade, CCNet's LM buckets, GPT-3's supervised
  * classifier are run TOGETHER in practice; Longpre et al. 2023
  * documents how their kill sets interact): per unordered pair of
  * signals, the integer confusion of their kill decisions over the
  * held-out slice where all three are defined. The q141 co-fire
  * matrix answers this WITHIN the rule family; this sheet answers it
  * ACROSS families — a signal whose kills are a subset of another's
  * adds no information to the cascade, and a near-zero both-kill cell
  * says the families catch independent garbage (the evidence for
  * keeping both).
  *
  * Signals (each from its own audited kernel, single-sourced with its
  * q-number so the sheets cannot drift):
  *  - `rules` — [[QualityRules.audit]] (q74): any precedence rule
  *    fired (reason ≠ 'kept');
  *  - `lm` — [[Phrases.lmQualityBuckets]] (q125): bucket ∈ {tail,
  *    empty} (the CCNet drop band; empty = < 2 tokens dies anyway);
  *  - `nb` — [[Classifier.nbQualityScores]] (q143): MAP-negative
  *    (predicted = 0). The sheet is restricted to the classifier's
  *    held-out scoring domain — the only slice where all three
  *    signals exist honestly (train docs would score themselves).
  *
  * Determinism: every kill flag is a deterministic integer/string
  * comparison over its family's bitwise-oracled sheet; the counts are
  * BIGINTs; `agree_q` is the exact two-step fixed-point
  * `floor((n_both_kill + n_neither)·2^20 / n)` (the q144 rate
  * kernel, −1 when the joined slice is empty — the q90 idiom).
  *
  * Scale shape (100 TB): the three family kernels keep their own
  * audited shapes; the join keys their doc_id-sized decision frames
  * (16-byte rows — text never re-shuffles); the closing is ONE global
  * aggregate of 24 boolean-pair sums collapsed map-side (a single row
  * crosses the exchange), exploded driver-free into the 6-row
  * sheet. */
object Ensemble {

  /** The signal names in declaration order — the single list
    * [[gateAgreement]] and its oracle index. */
  val SignalNames: Seq[String] = Seq("rules", "lm", "nb")

  /** The shared held-out kill frame: one row per held-out doc with
    * the three family decisions `(doc_id, k_rules, k_lm, k_nb)` —
    * [[gateAgreement]] and [[gateRatesBySource]] both read it, so
    * the two sheets cannot drift. */
  private def killFrame(docs: DataFrame, positive: Column,
      textCol: String, trainPermille: Int, buckets: Int,
      salt: String): DataFrame = {
    graft.GraftSession.ensureConfs(docs.sparkSession)
    // the three family constructors are independent and each runs its
    // own eager internal materializations (the NB (doc, bucket) count
    // frame, the LM scored frame) — build them concurrently so those
    // jobs overlap (guide §2.6); the returned frames stay lazy and the
    // composed join plan is unchanged
    val Seq(nb, lm, rl) = Par.run[DataFrame](
      () => Classifier.nbQualityScores(
          docs, positive, textCol, trainPermille, buckets, salt)
        .select(col("doc_id"), (col("predicted") === 0L).as("k_nb")),
      () => Phrases.lmQualityBuckets(docs, textCol)
        .select(col("doc_id"), col("bucket").isin("tail", "empty").as("k_lm")),
      () => QualityRules.audit(docs)
        .select(col("doc_id"), (col("reason") =!= "kept").as("k_rules")))
    nb.join(lm, Seq("doc_id")).join(rl, Seq("doc_id"))
  }

  /** One row per unordered signal pair (diagonal included):
    * `(sig_a, sig_b, n_both_kill, n_a_only, n_b_only, n_neither,
    * agree_q)` — 6 rows at 3 signals. Diagonal rows read their
    * signal's own kill count with zero one-sided cells and
    * agree_q = 2^20. */
  def gateAgreement(docs: DataFrame, positive: Column,
      textCol: String = "text", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame = {
    val j = killFrame(docs, positive, textCol, trainPermille, buckets, salt)
    val kcol = Map("rules" -> col("k_rules"), "lm" -> col("k_lm"),
      "nb" -> col("k_nb"))
    val pairs = for {
      i <- SignalNames.indices
      jx <- i until SignalNames.size
    } yield (SignalNames(i), SignalNames(jx))
    val aggs = pairs.flatMap { case (a, b) => Seq(
      sum(when(kcol(a) && kcol(b), 1L).otherwise(0L)).as(s"__bk|$a|$b"),
      sum(when(kcol(a) && !kcol(b), 1L).otherwise(0L)).as(s"__ao|$a|$b"),
      sum(when(!kcol(a) && kcol(b), 1L).otherwise(0L)).as(s"__bo|$a|$b"),
      sum(when(!kcol(a) && !kcol(b), 1L).otherwise(0L)).as(s"__nn|$a|$b"))
    }
    j.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(col("__n"), explode(array(pairs.map { case (a, b) =>
          struct(lit(a).as("sig_a"), lit(b).as("sig_b"),
            col(s"__bk|$a|$b").as("n_both_kill"),
            col(s"__ao|$a|$b").as("n_a_only"),
            col(s"__bo|$a|$b").as("n_b_only"),
            col(s"__nn|$a|$b").as("n_neither"))
        }: _*)).as("e"))
      .select(col("e.sig_a").as("sig_a"), col("e.sig_b").as("sig_b"),
        col("e.n_both_kill").as("n_both_kill"),
        col("e.n_a_only").as("n_a_only"),
        col("e.n_b_only").as("n_b_only"),
        col("e.n_neither").as("n_neither"),
        (col("e.n_both_kill") + col("e.n_neither")).as("__ag"), col("__n"))
      .withColumn("agree_q", expr(
        """CASE WHEN __n = 0 THEN CAST(-1 AS BIGINT)
          |ELSE ((__ag * 1024) DIV __n) * 1024 + (((__ag * 1024) % __n) * 1024) DIV __n
          |END""".stripMargin))
      .drop("__ag", "__n")
  }

  /** Per-SOURCE gate kill rates — the acquisition-level ablation the
    * published pipelines publish as their curation table (Dolma's
    * per-source keep fractions; RefinedWeb's removal-rate waterfall):
    * which feed fails which family, at what rate. q96 answers this
    * for the streaming rule gate alone; this sheet reads all three
    * families over the held-out slice (the [[gateAgreement]] kill
    * frame — single-sourced, so the two sheets cannot disagree) and
    * rolls them up per source. A source whose `nb` kill rate towers
    * over its `rules` rate is machine-generated-looking but
    * rule-clean — the classic laundered-spam signature; a source all
    * three families kill is a feed to drop at acquisition, not
    * filter at curation.
    *
    * Output: one row per source —
    * `(source, n, n_rules, n_lm, n_nb, rate_rules_q, rate_lm_q,
    * rate_nb_q)`; rates are the exact q144 two-step fixed point.
    * NULL sources group as the literal 'unknown' (the q76 idiom).
    *
    * Scale shape: the kill frame's audited shape plus ONE
    * map-side-combined rollup onto source keys (a sources-sized
    * frame; the doc_id join to recover the source column is
    * co-keyed with the kill frame's own exchanges). */
  def gateRatesBySource(docs: DataFrame, positive: Column,
      textCol: String = "text", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame = {
    val kf = killFrame(docs, positive, textCol, trainPermille, buckets, salt)
    val src = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), coalesce(col("source"), lit("unknown")).as("source"))
    ratesBySourceFromKillFrame(kf, src)
  }

  /** The feed-triage SCORECARD — the acquisition family's capstone:
    * one row per source joining the five per-source sheets the family
    * built, so the drop/keep/renegotiate decision about a feed reads
    * off a single relation: the q153 gate kill rates (which quality
    * family objects), the q154 dup census (how redundant the feed
    * is), the q155 KL fingerprint (how alien its content is), the
    * q156 length PSI (how alien its shape is), and the q193 language
    * KL (whether the feed's TEXT is in the language the corpus
    * expects — the seat the provenance label and the content-KL both
    * structurally miss: a feed that switches language shows here even
    * when its bigram concentration holds). The five members stay the
    * single source of truth — this operator ADDS only column pruning
    * and four broadcast left joins on source keys (sources-sized
    * frames; a source missing from the gate sheet — nothing held out
    * — carries NULLs there, never drops).
    *
    * Output: `(source, n_docs, dup_rate_q, drop_rate_q, n_gated,
    * rate_rules_q, rate_lm_q, rate_nb_q, kl_q, psi_q, psi_alert,
    * lang_kl_q)`. Deliberately a composition, not a re-derivation:
    * each column is bitwise its member sheet's value (EnsembleSpec
    * ties them out), and the oracle composes the five member oracles
    * the same way.
    *
    * Scale shape: the five audited member shapes; the joins touch
    * sources-sized frames only. */
  def sourceScorecard(docs: DataFrame, positive: Column,
      textCol: String = "text", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame = {
    // The five members are INDEPENDENT evidence passes that each end in
    // a sources-sized sheet; build them concurrently and materialize
    // each sheet (guide §2.6 — the members' eager jobs back-fill each
    // other's stage tails, so the scorecard's wall is ~the slowest
    // member, not the sum), and the composed plan downstream of here is
    // five sheet scans instead of five corpus chains — q162/q164/q166/
    // q167/q176 all embed this composition, so every one of their
    // plans (and AQE's per-stage replanning over them) shrinks by the
    // same amount. Results are bitwise unchanged: materialize only
    // cuts lineage.
    val Seq(dups, gates, kl, psi, lang, srcs) = Par.run[DataFrame](
      () => Dedup.materialize(Dedup.dupRatesBySource(docs)
        .select(col("source"), col("n").as("n_docs"),
          col("dup_rate_q"), col("drop_rate_q"))),
      () => Dedup.materialize(
        gateRatesBySource(docs, positive, textCol, trainPermille,
          buckets, salt)
        .select(col("source"), col("n").as("n_gated"),
          col("rate_rules_q"), col("rate_lm_q"), col("rate_nb_q"))),
      () => Dedup.materialize(Mixing.sourceKlDivergence(docs, textCol, buckets)
        .select(col("source"), col("kl_q"))),
      () => Dedup.materialize(Drift.lengthPsiBySource(docs, textCol)
        .select(col("source"), col("psi_q"), col("alert").as("psi_alert"))),
      () => Dedup.materialize(LangId.langKlBySource(docs, textCol,
          trainPermille = trainPermille, buckets = buckets, salt = salt)
        .select(col("source"), col("kl_q").as("lang_kl_q"))),
      // row universe + broadcast LEFT joins instead of full-outer
      // chaining: Spark cannot broadcast a full-outer join, so the
      // chain would sort-merge sources-sized frames. Every member's
      // sources are a subset of the all-docs universe (q154/q156
      // exclude doc_id-null DOCS but not their sources' other rows;
      // q153 covers the held-out slice), so the left joins produce
      // exactly the full-outer result — with NULLs where a member has
      // no row, never dropping a feed.
      () => Dedup.materialize(docs
        .select(coalesce(col("source"), lit("unknown")).as("source"))
        .distinct()))
    srcs.join(broadcast(dups), Seq("source"), "left")
      .join(broadcast(gates), Seq("source"), "left")
      .join(broadcast(kl), Seq("source"), "left")
      .join(broadcast(psi), Seq("source"), "left")
      .join(broadcast(lang), Seq("source"), "left")
  }

  /** Feed POLICY — the apply member of the acquisition family,
    * closing its detect→decide→act convention (the q140 pattern at
    * feed granularity): thresholds over the q159 scorecard columns
    * become one per-source verdict — 'drop' (a mirror or an alien
    * feed: dup rate or content-KL past the drop line), 'downweight'
    * (drifting form, rule-failing mass, or off-language text: PSI
    * alert, rules-kill rate, or language-KL past a damp line), else
    * 'keep'. The verdict column is BY CONSTRUCTION a CASE over the
    * scorecard (the oracle composes the q159 CTE verbatim), so
    * policy can never disagree with the evidence sheet a reviewer
    * reads.
    *
    * NULL semantics (both engines identically): a source absent from
    * a member sheet carries NULL metrics, NULL comparisons are never
    * true, so an evidence-free source KEEPS — policy only acts on
    * measured signals; review the scorecard's NULLs separately.
    *
    * Default lines: dup_rate_q ≥ 2^19 (half the feed is near-dup
    * mass — a mirror), kl_q ≥ 192 (3 bits/bigram from the corpus —
    * alien content), psi_alert (the industry 0.3 PSI line, q156),
    * rate_rules_q ≥ 838861 (~0.8 — four in five docs fail the
    * mechanical rules), lang_kl_q ≥ 128 (2 bits/doc of
    * predicted-language divergence — a feed concentrated on a
    * language holding ≤ a quarter of the corpus: damp, don't drop —
    * off-language text is re-routable, a mirror is not). All
    * integer/fixed-point → bitwise oracle.
    *
    * Scale shape: exactly q159's audited composition plus one
    * map-side CASE over the sources-sized sheet. */
  def feedPolicy(docs: DataFrame, positive: Column,
      dropDupQ: Long = 524288L, dropKlQ: Long = 192L,
      downRulesQ: Long = 838861L, downLangKlQ: Long = 128L,
      textCol: String = "text",
      trainPermille: Int = 500, buckets: Int = 8192,
      salt: String = "graft"): DataFrame =
    sourceScorecard(docs, positive, textCol, trainPermille, buckets, salt)
      .withColumn("verdict",
        when(col("dup_rate_q") >= dropDupQ || col("kl_q") >= dropKlQ, "drop")
          .when(col("psi_alert") === 1L || col("rate_rules_q") >= downRulesQ ||
            col("lang_kl_q") >= downLangKlQ, "downweight")
          .otherwise("keep"))

  /** Feed-policy OPERATING POINTS — the q147 evidence sheet for the
    * q162 drop lines, closing the advisor's "bare constants" gap: the
    * default `dropDupQ`/`dropKlQ` thresholds were picked by hand, and
    * the classifier family already established (q147) that thresholds
    * deserve a data-driven sweep. Candidate lines are the EXACT
    * deciles of the scorecard's own dup_rate_q and kl_q columns (the
    * q60-pinned percentile_disc selection via
    * [[Quantiles.globalQuantileDisc]] — existing values, not
    * arbitrary constants), crossed into a ≤ 9×9 grid; for every
    * (thr_dup_q, thr_kl_q) pair the [[feedPolicy]] CASE replays with
    * those drop lines (damp lines fixed at the shipped defaults) and
    * the sheet reports what the policy would DO: sources and docs
    * dropped / damped / kept, and the kept KL-to-corpus mass
    * Σ kl_q·n_docs over surviving feeds — the release owner picks the
    * knee of that curve instead of trusting 2^19 and 192.
    *
    * Determinism: thresholds are SELECTED existing BIGINT values; the
    * verdict is the q162 CASE under identical three-valued NULL
    * logic; every output column is a BIGINT sum/count — the whole
    * sheet oracles bitwise (q166; the oracle embeds the q159
    * composition verbatim, the established pattern).
    *
    * Scale shape (100 TB): the q159 composition runs ONCE and
    * materializes (sources-sized); the decile passes and the sweep
    * all touch that sheet crossed with a ≤ 81-row broadcast grid —
    * nothing corpus-sized moves. */
  def feedPolicyOperatingPoints(docs: DataFrame, positive: Column,
      downRulesQ: Long = 838861L, downLangKlQ: Long = 128L,
      textCol: String = "text",
      trainPermille: Int = 500, buckets: Int = 8192,
      salt: String = "graft"): DataFrame = {
    val sc = Dedup.materialize(
      sourceScorecard(docs, positive, textCol, trainPermille, buckets, salt))
    val qs = (1 until 10).map { i =>
      s"e$i" -> (BigDecimal(i) / BigDecimal(10)).toDouble
    }
    def axis(valCol: String, out: String): DataFrame =
      Quantiles.globalQuantileDisc(sc, valCol, qs,
          materializeInput = false) // sc is already materialized
        .select(explode(array(qs.map { case (n, _) => col(n) }: _*)).as(out))
        .filter(col(out).isNotNull).distinct()
    val grid = axis("dup_rate_q", "thr_dup_q")
      .crossJoin(broadcast(axis("kl_q", "thr_kl_q")))
    sc.crossJoin(broadcast(grid))
      .withColumn("__v",
        when(col("dup_rate_q") >= col("thr_dup_q") ||
            col("kl_q") >= col("thr_kl_q"), "drop")
          .when(col("psi_alert") === 1L || col("rate_rules_q") >= downRulesQ ||
            col("lang_kl_q") >= downLangKlQ, "downweight")
          .otherwise("keep"))
      .groupBy(col("thr_dup_q"), col("thr_kl_q"))
      .agg(
        sum(when(col("__v") === "drop", 1L).otherwise(0L)).as("n_drop_src"),
        sum(when(col("__v") === "downweight", 1L).otherwise(0L)).as("n_down_src"),
        sum(when(col("__v") === "keep", 1L).otherwise(0L)).as("n_keep_src"),
        sum(when(col("__v") === "drop", coalesce(col("n_docs"), lit(0L)))
          .otherwise(0L)).as("docs_dropped"),
        sum(when(col("__v") === "downweight", coalesce(col("n_docs"), lit(0L)))
          .otherwise(0L)).as("docs_damped"),
        sum(when(col("__v") === "keep", coalesce(col("n_docs"), lit(0L)))
          .otherwise(0L)).as("docs_kept"),
        sum(when(col("__v") =!= "drop",
          coalesce(col("kl_q"), lit(0L)) * coalesce(col("n_docs"), lit(0L)))
          .otherwise(0L)).as("kept_kl_mass_q"))
  }

  /** ACT on a [[feedPolicy]] sheet: the filtered corpus a release
    * build (q71/q108) consumes. 'drop' sources vanish; 'downweight'
    * sources keep a deterministic `downweightPermille` md5-bucket
    * slice of their docs (the q55 idiom under its own salt — stable
    * under incremental loads, so a damped feed's kept docs never
    * churn between builds); 'keep' sources pass whole. NULL doc_ids
    * are never emitted (no stable identity to sample by — the q55
    * contract). Returns the docs' original columns.
    *
    * Scale shape: the q159 composition runs once on the sources-sized
    * evidence; the corpus-side act is ONE broadcast join of the
    * verdict sheet plus a map-side bucket filter — no shuffle of the
    * corpus at all. */
  def applyFeedPolicy(docs: DataFrame, positive: Column,
      downweightPermille: Int = 500, dropDupQ: Long = 524288L,
      dropKlQ: Long = 192L, downRulesQ: Long = 838861L,
      downLangKlQ: Long = 128L,
      textCol: String = "text", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft",
      downSalt: String = "downweight"): DataFrame = {
    // the verdict sheet MATERIALIZES (sources-sized): the whole q159
    // evidence chain behind it runs exactly once no matter how many
    // times a composition evaluates the acted corpus — q176's capped
    // allocation consumes the act in a separate eager job from the
    // manifest join, where single-plan ReuseExchange can no longer
    // deduplicate the evidence subtree (measured +52 MB at SCALE x8
    // without this)
    val verdicts = Dedup.materialize(
      feedPolicy(docs, positive, dropDupQ, dropKlQ, downRulesQ,
          downLangKlQ, textCol, trainPermille, buckets, salt)
        .select(col("source"), col("verdict")))
    actOnVerdicts(docs, verdicts, downweightPermille, downSalt)
  }

  /** The shared ACT kernel under [[applyFeedPolicy]] (where the
    * verdict sheet covers every source by construction) and the
    * streaming policy gate ([[graft.streaming.Curation
    * .feedPolicyGate]], where an arrival can carry a feed the
    * standing sheet has never seen): rows from a verdict-less source
    * KEEP — the [[feedPolicy]] NULL rule applied to the act side
    * (policy only acts on measured evidence). One broadcast join of
    * the sources-sized sheet plus a map-side md5-bucket damp filter;
    * the corpus/batch never shuffles. */
  def actOnVerdicts(docs: DataFrame, verdicts: DataFrame,
      downweightPermille: Int = 500,
      downSalt: String = "downweight"): DataFrame = {
    require(downweightPermille >= 0 && downweightPermille <= 1000,
      s"downweightPermille must be in [0,1000], got $downweightPermille")
    // Hardened against caller-supplied sheets: the sheet's verdict is
    // aliased to an internal name BEFORE the join (a corpus that
    // itself carries a `verdict` column can no longer make the
    // reference ambiguous); a NULL verdict IN the sheet reads 'keep'
    // (the same evidence-free rule as a missing row); and duplicate
    // rows per source collapse deterministically to the most severe
    // verdict — drop > any unrecognized string (which kills its rows,
    // so it outranks a damp) > downweight > keep, ties on severity
    // breaking on the lexicographically smallest string. feedPolicy's
    // own sheet is unique per source, so for the q162→q164 chain the
    // collapse is the identity.
    val v = verdicts
      .select(col("source").as("__vsrc"),
        coalesce(col("verdict"), lit("keep")).as("__vv"))
      .withColumn("__sev",
        when(col("__vv") === "drop", 0L)
          .when(col("__vv") === "downweight", 2L)
          .when(col("__vv") === "keep", 3L)
          .otherwise(1L))
      .groupBy(col("__vsrc"))
      .agg(min(struct(col("__sev"), col("__vv"))).as("__m"))
      .select(col("__vsrc"), col("__m.__vv").as("__verdict"))
    val original = docs.columns.toSeq
    Sampling.withSplitBucket(docs, "doc_id", downSalt)
      .withColumn("__src", coalesce(col("source"), lit("unknown")))
      .join(broadcast(v), col("__src") === col("__vsrc"), "left")
      .withColumn("__v", coalesce(col("__verdict"), lit("keep")))
      .filter(col("__v") === "keep" ||
        (col("__v") === "downweight" &&
          col("__bucket") < downweightPermille))
      .select(original.map(col): _*)
  }

  /** The shared per-source rollup: a kill frame
    * `(doc_id, k_rules, k_lm, k_nb)` joined to its source column and
    * collapsed onto source keys with exact two-step fixed-point rates
    * — [[gateRatesBySource]] (the batch sheet, q153) and
    * [[graft.streaming.Curation.gateRatesMonitor]] (the per-batch
    * ingest monitor) both close through it, so the two sheets cannot
    * drift. */
  private[graft] def ratesBySourceFromKillFrame(kf: DataFrame,
      src: DataFrame): DataFrame = {
    def rate(cnt: String) = expr(
      s"""CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
         |ELSE (($cnt * 1024) DIV n) * 1024 + ((($cnt * 1024) % n) * 1024) DIV n
         |END""".stripMargin)
    kf.join(src, Seq("doc_id"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n"),
        sum(when(col("k_rules"), 1L).otherwise(0L)).as("n_rules"),
        sum(when(col("k_lm"), 1L).otherwise(0L)).as("n_lm"),
        sum(when(col("k_nb"), 1L).otherwise(0L)).as("n_nb"))
      .withColumn("rate_rules_q", rate("n_rules"))
      .withColumn("rate_lm_q", rate("n_lm"))
      .withColumn("rate_nb_q", rate("n_nb"))
  }
}
