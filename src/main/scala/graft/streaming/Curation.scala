package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Curation at INGEST — the library composition of the map-side quality
  * rules (the subset of q74's audit that needs no corpus-level
  * aggregation: too_short / non_english / low_stopword) with
  * bounded-state exact dedup ([[StreamingDedup.dedupWithinWatermark]]).
  * This is the reference's whole point — processing applied while data
  * streams in (`/root/reference/01-setup-ec-vm.md:340-398` runs its
  * transform inside the micro-batch) — generalized to the
  * training-data-pipeline gate a 100 TB/day ingest needs.
  *
  * The corpus-level repetition rules (q72's top token/bigram mass) are
  * deliberately absent from the gate: they are per-doc aggregations a
  * map task CAN compute, but their thresholds are corpus-audit
  * decisions, not ingest decisions — run q74 over the landed table for
  * those.
  *
  * Rule order: quality FIRST, dedup second — the filter shrinks the
  * stream before the stateful operator, so dedup state is proportional
  * to the kept fraction of the delay window, not the raw feed. The two
  * orders are semantically interchangeable (the rules are per-row
  * deterministic functions, so a duplicate passes the gate iff its
  * original does), making the cheaper order free.
  *
  * All thresholds are integer cross-multiplications (stopwordPct is a
  * percent), so the batch twin ([[batchAudit]], catalog entry q81)
  * oracle-checks bitwise in DuckDB.
  */
object Curation {

  /** The two map-side stat columns the gate reads. Internal names are
    * __-prefixed so they can never collide with user payload columns.
    * A NULL text coalesces to n_tokens = −1 EXPLICITLY (session
    * `size(NULL)` conventions vary), so the gate is TOTAL on null
    * payloads: they drop as too_short rather than throwing or
    * silently passing every rule on NULL comparisons. */
  private def withStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__n_tokens",
        coalesce(size(TextFunctions.rawTokens(col(textCol))).cast("long"), lit(-1L)))
      .withColumn("__stop_cnt",
        coalesce(TextFunctions.stopwordCount(col(textCol)), lit(0L)))

  /** First-failing-rule reason over the stat columns, by precedence:
    * too_short → non_english → low_stopword → kept. */
  private def qualityReason(langCol: String, minTokens: Int, lang: String,
      stopwordPct: Int): Column =
    when(col("__n_tokens") < minTokens, "too_short")
      .when(col(langCol) =!= lang, "non_english")
      .when(lit(100L) * col("__stop_cnt") <
        lit(stopwordPct.toLong) * col("__n_tokens"), "low_stopword")
      .otherwise("kept")

  /** Map-side quality gate: keep only rows passing every rule; schema
    * is preserved (the stat columns never escape). Works identically on
    * batch and streaming frames — pure narrow projection + filter. */
  def keepByQuality(df: DataFrame, textCol: String = "text",
      langCol: String = "lang", minTokens: Int = 20, lang: String = "en",
      stopwordPct: Int = 2): DataFrame = {
    val original = df.columns.toSeq
    withStats(df, textCol)
      .filter(qualityReason(langCol, minTokens, lang, stopwordPct) === "kept")
      .select(original.map(col): _*)
  }

  /** The streaming ingest gate: quality rules then watermark-bounded
    * exact dedup on `keys`. State is bounded by the delay window over
    * the KEPT stream; a duplicate arriving later than `delay` re-emits
    * (downstream idempotent upsert — [[graft.sinks.UpsertWriter]] —
    * absorbs it). Append-mode friendly: no aggregation, no sort. */
  def ingestGate(stream: DataFrame, eventTimeCol: String, delay: String,
      keys: Seq[String], textCol: String = "text", langCol: String = "lang",
      minTokens: Int = 20, lang: String = "en", stopwordPct: Int = 2): DataFrame =
    StreamingDedup.dedupWithinWatermark(
      keepByQuality(stream, textCol, langCol, minTokens, lang, stopwordPct),
      eventTimeCol, delay, keys)

  /** Streaming Bloom decontamination gate — q116's broadcast probe
    * ([[graft.operators.Decontaminate.bloomContaminationCandidates]])
    * composed at INGEST: the eval split's Bloom filter is STATIC and
    * tiny (one row, ≤ mBits map entries — build it once with
    * [[graft.operators.Decontaminate.bloomEvalMask]]), so the
    * streaming side is a pure map-side probe with ZERO state: each
    * arriving document computes its distinct 3-gram shingles, probes
    * the 4 Bloom positions of every shingle against the broadcast bit
    * map (a shingle is a contamination CANDIDATE iff all 4 bits are
    * set — no false negatives, fill⁴ false-positive rate), and is
    * flagged when ≥ `minOverlap` of its shingles are candidates.
    * Append-mode friendly: no aggregation, no watermark, no join
    * state — the one stream-static crossJoin broadcasts a single row.
    *
    * Emits the input columns plus `(n_shingles, n_candidates,
    * contaminated)` — route flagged rows to quarantine/exact-recheck,
    * let the rest land. Identical arithmetic to the batch probe: the
    * same fixture streamed through this gate flags exactly q116's
    * candidate set (StreamingDecontaminationSpec pins it). Null text
    * is total: 0 shingles, 0 candidates, not contaminated. */
  def decontaminationGate(stream: DataFrame, mask: DataFrame,
      textCol: String = "text", mBits: Long = 1L << 18,
      minOverlap: Long = 3L): DataFrame = {
    require(mBits > 0, s"mBits must be positive, got $mBits")
    val shs = array_distinct(TextFunctions.tokenNgrams(
      split(lower(col(textCol)), "\\s+"), 3))
    val isCandidate: Column => Column = sh =>
      (0 until 4).map { j =>
        element_at(col("__bmask"),
          graft.operators.Decontaminate.bloomPosition(sh, j, mBits)).isNotNull
      }.reduce(_ && _)
    stream.crossJoin(broadcast(mask))
      .withColumn("__shs", shs)
      .withColumn("n_shingles",
        coalesce(size(col("__shs")).cast("long"), lit(0L)))
      .withColumn("n_candidates",
        coalesce(size(filter(col("__shs"), isCandidate)).cast("long"), lit(0L)))
      .withColumn("contaminated", col("n_candidates") >= minOverlap)
      .drop("__shs", "__bmask")
      // size(NULL array) is -1 under legacy sizeOfNull: clamp the
      // null-text sentinel to the documented zeros
      .withColumn("n_shingles", greatest(col("n_shingles"), lit(0L)))
      .withColumn("n_candidates", greatest(col("n_candidates"), lit(0L)))
  }

  /** Streaming LM-quality gate — q125's CCNet-style perplexity filter
    * applied at INGEST, completing the quality family's streaming twin
    * (the [[decontaminationGate]] pattern): the unigram model's cost
    * map ([[graft.operators.Phrases.unigramCostMap]]) and the standing
    * corpus's ppl cuts ([[graft.operators.Phrases.lmQualityCuts]]) are
    * STATIC one-row frames — exactly what a production system persists
    * beside its tokenizer — broadcast onto the stream; each arriving
    * document tokenizes, runs the per-token Viterbi fold map-side
    * (the same integer arithmetic as the batch sheet, so the buckets
    * agree bitwise — StreamingLmQualitySpec pins it), and is labeled
    * head/middle/tail/empty. ZERO streaming state; append-mode.
    *
    * Emits the input columns plus `(n_pieces, cost_q, ppl_q, bucket)`
    * — route 'tail' to quarantine, keep 'head'/'middle', exactly the
    * CCNet deployment shape. Null/empty text buckets 'empty'. */
  def lmQualityGate(stream: DataFrame, model: DataFrame, cuts: DataFrame,
      textCol: String = "text", maxPieceLen: Int = 4,
      maxWordLen: Int = 12): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= 1,
      s"bad parameters ($maxPieceLen, $maxWordLen)")
    val Q = 1048576L
    stream.crossJoin(broadcast(model)).crossJoin(broadcast(cuts))
      .withColumn("__toks", expr(
        s"filter(transform(split(lower($textCol), '\\\\s+'), " +
          s"t -> substring(t, 1, $maxWordLen)), w -> length(w) >= 1)"))
      // no model (empty standing corpus → empty cost map) ⇒ nothing is
      // segmentable: NULL budget, zeros, bucket 'empty' — guarded HERE
      // so the shared DP kernel keeps its all-singles precondition
      .withColumn("__b", when(size(col("cmap")) > 0,
        expr(graft.operators.Phrases.tokenBudgetExpr(maxPieceLen))))
      .withColumn("n_pieces", coalesce(
        expr("aggregate(__b, CAST(0 AS BIGINT), (a, x) -> a + x.np)"), lit(0L)))
      .withColumn("cost_q", coalesce(
        expr("aggregate(__b, CAST(0 AS BIGINT), (a, x) -> a + x.cost)"), lit(0L)))
      .withColumn("ppl_q", when(col("n_pieces") > 0L,
        expr(s"CAST((cost_q * $Q) DIV n_pieces AS BIGINT)")).otherwise(lit(0L)))
      .withColumn("bucket",
        when(col("n_pieces") === 0L, "empty")
          .when(col("ppl_q") <= col("p33"), "head")
          .when(col("ppl_q") <= col("p67"), "middle")
          .otherwise("tail"))
      .drop("__toks", "__b", "cmap", "p33", "p67")
  }

  /** Streaming quality-classifier gate — q143's supervised NB keep
    * gate applied at INGEST, completing the quality family's
    * supervised streaming twin (the [[lmQualityGate]] pattern): the
    * trained model is ONE static broadcast row
    * ([[graft.operators.Classifier.nbModelRow]] —
    * `(bmap, prior_q, k_q)`, the classifier artifact a production
    * system persists), and each arriving document tokenizes, hashes
    * its bigrams and folds the per-occurrence bucket weights entirely
    * map-side: `score_q = prior_q + Σ coalesce(bmap[b], 0) +
    * n_bigrams·k_q` — the identical integer arithmetic as the batch
    * sheet (per-occurrence summation ≡ the batch's occ-grouped form),
    * so scores and decisions agree bitwise
    * (StreamingClassifierSpec pins it). ZERO streaming state;
    * append-mode; no watermark.
    *
    * Emits the input columns plus `(n_bigrams, score_q, predicted)` —
    * route predicted=0 to quarantine, exactly the GPT-3/LLaMA
    * classifier-gate deployment shape. Null/short text scores
    * prior-only (unseen buckets are 0 by the model decomposition, so
    * OOV ingest can never crash or skew the gate — the OOV-gate
    * posture). */
  def classifierGate(stream: DataFrame, model: DataFrame,
      textCol: String = "text", buckets: Int = 8192): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = TextFunctions.tokens(col(textCol))
    stream.crossJoin(broadcast(model))
      .withColumn("__t", toks)
      .withColumn("__bgs", zip_with(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => graft.operators.Dedup.md5Base48Of(
          md5(concat(a, lit(" "), b))) % buckets.toLong))
      .withColumn("n_bigrams",
        greatest(coalesce(size(col("__bgs")).cast("long"), lit(0L)), lit(0L)))
      .withColumn("__sfeat", coalesce(
        aggregate(col("__bgs"), lit(0L),
          (acc, b) => acc + coalesce(element_at(col("bmap"), b), lit(0L))),
        lit(0L)))
      .withColumn("score_q",
        col("prior_q") + col("__sfeat") + col("n_bigrams") * col("k_q"))
      .withColumn("predicted",
        when(col("score_q") >= 0L, lit(1L)).otherwise(lit(0L)))
      .drop("__t", "__bgs", "__sfeat", "bmap", "prior_q", "k_q")
  }

  /** Streaming ANN near-dup gate — the semantic-dedup member of the
    * streaming-twin family (the [[decontaminationGate]] /
    * [[lmQualityGate]] pattern applied to the vector side): an
    * arriving embedding is probed against the STANDING index — the
    * broadcast centroid row ([[graft.operators.Similarity
    * .annGateCentroids]]) and the per-cell kept-representative map
    * ([[graft.operators.Similarity.annGateKeptIndex]]), both static
    * one-row frames a production system persists — and vetoed at
    * ingest when a kept standing vector in its argmax cell reaches
    * `threshold` cosine. ZERO streaming state: the argmax cell is one
    * map-side fold over the centroid array (the ivfAssign
    * max(struct(cos, −c_id)) rule as an expression), the veto one
    * `exists` over the cell's kept list; append-mode, no watermark.
    *
    * Emits the input columns plus `(cell, kept)` — exactly q113/q114's
    * disposition vocabulary, and the SAME cosine arithmetic
    * (graft_dot, unnormalized vectors, norm product), so a streamed
    * batch's dispositions equal q114's frozen-decision output wherever
    * q114's within-batch rule is idle (StreamingAnnGateSpec pins it).
    * Within-STREAM near-dups are deliberately out of scope — a
    * per-row gate cannot see batch-mates; compose with
    * [[StreamingDedup.dedupWithinWatermark]] on an exact key, or run
    * q114 over the landed table, for that half.
    *
    * Null / wrong-length / zero-norm arrivals pass with
    * `(cell NULL, kept 1)` — nothing to compare against, and a gate
    * must never crash the query on malformed input (the OOV-gate
    * posture). An EMPTY standing index (no centroids) likewise keeps
    * everything. */
  def annDedupGate(stream: DataFrame, centroidRow: DataFrame, keptRow: DataFrame,
      threshold: Double, dim: Int, embCol: String = "embedding"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val cosTo: (Column, Column, Column) => Column = (v, n, c) =>
      graft.operators.Similarity.dot(v, c.getField("cv")) / (n * c.getField("cn"))
    stream.crossJoin(broadcast(centroidRow)).crossJoin(broadcast(keptRow))
      .withColumn("__v", col(embCol).cast("array<double>"))
      .withColumn("__n",
        when(col("__v").isNotNull && size(col("__v")) === dim,
          sqrt(graft.operators.Similarity.dot(col("__v"), col("__v")))))
      .withColumn("__best",
        when(col("__n") > 0.0 && size(col("cents")) > 0,
          aggregate(col("cents"),
            struct(lit(-2.0).as("cos"), lit(Long.MinValue).as("neg")),
            (acc, c) => {
              val cos = cosTo(col("__v"), col("__n"), c)
              val neg = -c.getField("c_id")
              when(cos > acc.getField("cos") ||
                (cos === acc.getField("cos") && neg > acc.getField("neg")),
                struct(cos.as("cos"), neg.cast("long").as("neg")))
                .otherwise(acc)
            })))
      .withColumn("cell", (-col("__best.neg")).cast("long"))
      .withColumn("kept",
        when(col("cell").isNull, 1L)
          .when(exists(coalesce(element_at(col("kmap"), col("cell")),
            array().cast("array<struct<b_id:bigint,bv:array<double>,bn:double>>")),
            b => graft.operators.Similarity.dot(col("__v"), b.getField("bv")) /
              (col("__n") * b.getField("bn")) >= threshold), 0L)
          .otherwise(1L))
      .drop("__v", "__n", "__best", "cents", "kmap")
  }

  /** Per-batch gate-rate monitor — q153's sheet applied at INGEST,
    * the monitoring twin of the per-source ablation (the
    * [[graft.operators.Drift.psiAgainstModel]] pattern): each
    * micro-batch is scored against the STANDING models and rolled up
    * per source, so a feed that suddenly fails a family at 3× its
    * norm is visible the batch it happens, not at the next corpus
    * audit. Call inside `foreachBatch`; each batch is its own
    * comparison unit (rate semantics — no cross-batch state).
    *
    * The three family decisions are the existing stateless kernels:
    * the q74 rule audit (per-doc aggregations a batch frame computes
    * locally), [[lmQualityGate]] against the broadcast cost map +
    * cuts, and [[classifierGate]] against the broadcast NB model row
    * — and the rollup is [[graft.operators.Ensemble
    * .ratesBySourceFromKillFrame]], the SAME closing the batch sheet
    * uses, so streamed rates cannot drift from q153's definition
    * (StreamingGateRatesSpec pins a full held-out batch bitwise-equal
    * to the batch sheet). Output: one row per source in the batch —
    * `(source, n, n_rules, n_lm, n_nb, rate_rules_q, rate_lm_q,
    * rate_nb_q)`.
    *
    * Scale shape: zero streaming state; the models are static
    * broadcast one-row frames; the only batch-local exchanges are the
    * rule audit's per-doc (doc_id, term) combines and the
    * sources-sized rollup — all within the micro-batch. */
  def gateRatesMonitor(batch: DataFrame, lmModel: DataFrame,
      lmCuts: DataFrame, nbModel: DataFrame, textCol: String = "text",
      buckets: Int = 8192): DataFrame = {
    import graft.operators.{Ensemble, QualityRules}
    val rl = QualityRules.audit(batch)
      .select(col("doc_id"), (col("reason") =!= "kept").as("k_rules"))
    val lm = lmQualityGate(batch.select(col("doc_id"), col(textCol)),
        lmModel, lmCuts, textCol)
      .select(col("doc_id"), col("bucket").isin("tail", "empty").as("k_lm"))
    val nb = classifierGate(batch.select(col("doc_id"), col(textCol)),
        nbModel, textCol, buckets)
      .select(col("doc_id"), (col("predicted") === 0L).as("k_nb"))
    val kf = nb.join(lm, Seq("doc_id")).join(rl, Seq("doc_id"))
    val src = batch.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), coalesce(col("source"), lit("unknown")).as("source"))
    Ensemble.ratesBySourceFromKillFrame(kf, src)
  }

  /** Per-source rollup of [[annDedupGate]] dispositions — the dup
    * member of the [[scorecardMonitor]] composition: for every feed
    * in the micro-batch, how much of its mass the standing ANN index
    * already holds (kept = 0 — a vetoed near-dup of a kept standing
    * vector). The streaming seat of what q154 measures at the corpus
    * audit; rates are the exact two-step fixed point, so the sheet
    * composes bitwise with the batch members. Output: one row per
    * source — `(source, n, n_dup, dup_rate_q)`.
    *
    * Scale shape: the gate is a stateless map-side probe against two
    * broadcast one-row frames; the rollup collapses map-side onto
    * source keys. */
  def annGateRatesBySource(batch: DataFrame, centroidRow: DataFrame,
      keptRow: DataFrame, threshold: Double, dim: Int,
      embCol: String = "embedding"): DataFrame = {
    val gated = annDedupGate(batch, centroidRow, keptRow, threshold, dim, embCol)
    def rate(cnt: String) = expr(
      s"""CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
         |ELSE (($cnt * 1024) DIV n) * 1024 + ((($cnt * 1024) % n) * 1024) DIV n
         |END""".stripMargin)
    gated
      .select(coalesce(col("source"), lit("unknown")).as("source"), col("kept"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept") === 0L, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_rate_q", rate("n_dup"))
  }

  /** Per-batch SCORECARD monitor — q159's sheet shape at INGEST: each
    * micro-batch scored against the FIVE standing model families and
    * rolled to one row per source, so the drop/keep/renegotiate
    * evidence about a feed is visible the batch it degrades, not at
    * the next corpus audit. Apply inside `foreachBatch`; zero
    * streaming state — every member is a stateless probe of broadcast
    * standing artifacts, and each batch is its own comparison unit.
    *
    * Deliberately a composition, not a re-derivation (the q159
    * contract): the gate columns close through [[gateRatesMonitor]]
    * (itself bitwise q153's rollup), the dup column through
    * [[annGateRatesBySource]] (the standing-index seat of the dup
    * census), the KL column through [[graft.operators.Drift
    * .klBySourceAgainstModel]] (bitwise q155's arithmetic), the PSI
    * columns through [[graft.operators.Drift
    * .psiBySourceAgainstModel]] (bitwise q156's), and the language
    * column through [[graft.operators.LangId
    * .langKlBySourceAgainstModel]] (the q193 close against the
    * standing lang artifacts — the gate kernel is pinned bitwise to
    * the batch scorer) — StreamingScorecardSpec pins a streamed
    * batch's sheet bitwise to the members' batch sheets on the same
    * fixture. The join layer is q159's own: a distinct source
    * universe + broadcast LEFT joins (never full-outer — Spark cannot
    * broadcast one), NULLs where a member has no row, no feed ever
    * dropped. Output: one row per source — `(source, n_docs,
    * dup_rate_q, n_gated, rate_rules_q, rate_lm_q, rate_nb_q, kl_q,
    * psi_q, psi_alert, lang_kl_q)` (no drop_rate_q: canonicality is
    * a corpus-audit notion — q154's — not a per-batch one).
    *
    * Scale shape: five stateless member probes of broadcast model
    * rows; the only batch-driven exchanges are the members' audited
    * ones; the closing joins touch sources-sized sheets only. */
  def scorecardMonitor(batch: DataFrame, lmModel: DataFrame,
      lmCuts: DataFrame, nbModel: DataFrame, psiModel: DataFrame,
      klModel: DataFrame, langModel: DataFrame, langDistRow: DataFrame,
      centroidRow: DataFrame, keptRow: DataFrame,
      annThreshold: Double, dim: Int, textCol: String = "text",
      embCol: String = "embedding", buckets: Int = 8192,
      bins: Int = 10): DataFrame = {
    import graft.operators.Drift
    val base = batch.filter(col("doc_id").isNotNull)
    val dup = annGateRatesBySource(base, centroidRow, keptRow,
        annThreshold, dim, embCol)
      .select(col("source"), col("n").as("n_docs"), col("dup_rate_q"))
    val gates = gateRatesMonitor(batch, lmModel, lmCuts, nbModel,
        textCol, buckets)
      .select(col("source"), col("n").as("n_gated"),
        col("rate_rules_q"), col("rate_lm_q"), col("rate_nb_q"))
    val kl = Drift.klBySourceAgainstModel(batch, klModel, textCol, buckets)
      .select(col("source"), col("kl_q"))
    val psi = Drift.psiBySourceAgainstModel(base, psiModel, textCol, bins)
      .select(col("source"), col("psi_q"), col("alert").as("psi_alert"))
    val lang = graft.operators.LangId.langKlBySourceAgainstModel(
        batch, langModel, langDistRow, textCol, buckets = buckets)
      .select(col("source"), col("kl_q").as("lang_kl_q"))
    val srcs = batch
      .select(coalesce(col("source"), lit("unknown")).as("source")).distinct()
    srcs.join(broadcast(dup), Seq("source"), "left")
      .join(broadcast(gates), Seq("source"), "left")
      .join(broadcast(kl), Seq("source"), "left")
      .join(broadcast(psi), Seq("source"), "left")
      .join(broadcast(lang), Seq("source"), "left")
  }

  /** Feed-policy gate — the q162 ACT at INGEST: arrivals filtered
    * against the STANDING verdict sheet (built by the batch
    * [[graft.operators.Ensemble.feedPolicy]] at the last corpus
    * audit, broadcast like every other standing model): 'drop' feeds
    * vanish at the door, 'downweight' feeds keep their deterministic
    * md5-bucket slice (stable across batches and retries — a damped
    * feed's kept docs never churn), 'keep' and NEVER-SEEN feeds pass
    * whole (policy only acts on measured evidence — the q162 NULL
    * rule; an unseen feed is the next audit's problem, not a silent
    * ingest drop). Single-sourced through [[graft.operators.Ensemble
    * .actOnVerdicts]] — the same kernel the batch act closes through,
    * so gate and act CANNOT drift (StreamingPolicyGateSpec pins a
    * streamed batch bitwise to the batch act).
    *
    * Scale shape: zero streaming state; one broadcast join of the
    * sources-sized sheet + a map-side bucket filter per batch. */
  def feedPolicyGate(stream: DataFrame, verdicts: DataFrame,
      downweightPermille: Int = 500,
      downSalt: String = "downweight"): DataFrame =
    graft.operators.Ensemble.actOnVerdicts(stream, verdicts,
      downweightPermille, downSalt)

  /** Streaming DSIR resample gate — the q161 keep rule at INGEST,
    * the mixing family's streaming twin (the [[classifierGate]]
    * pattern): the standing state is TWO broadcast one-row frames a
    * production system persists at the corpus audit — the
    * [[graft.operators.Mixing.dsirModelRow]] bucket-ratio map
    * `(lrmap, lr0_q)` and the [[graft.operators.Mixing
    * .resampleCutRow]] percentile cut — and each arriving document
    * weighs itself entirely map-side: bigrams hash to the model's
    * buckets, `weight_q = Σ coalesce(lrmap[b], lr0_q)` (bitwise the
    * batch Σ occ·lr_q wherever the bucket was observed; the smoothed
    * normalizer ratio for novel buckets), the Gumbel key evaluates
    * through the SHARED [[graft.operators.Mixing.withGumbelKey]]
    * kernel under the same sampleSalt, and the arrival is kept iff
    * `key_q > cut` — the exact q161 strict rule, so a streamed batch
    * of standing-corpus docs keeps bitwise q161's keep-set
    * (StreamingResampleGateSpec pins it). ZERO streaming state;
    * append-mode; no watermark.
    *
    * Emits the input columns plus `(n_bigrams, weight_q, key_q)`.
    * NULL doc_ids never pass (no stable identity to key — the q55
    * contract); NULL/short text weighs 0 and competes on pure noise;
    * a NULL cut (empty standing corpus) keeps nothing — audit before
    * arming, like every standing model. */
  def resampleGate(stream: DataFrame, model: DataFrame, cutRow: DataFrame,
      textCol: String = "text", buckets: Int = 8192,
      sampleSalt: String = "resample"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = TextFunctions.tokens(col(textCol))
    val weighed = stream.filter(col("doc_id").isNotNull)
      .crossJoin(broadcast(model))
      .withColumn("__t", toks)
      .withColumn("__bgs", zip_with(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => graft.operators.Dedup.md5Base48Of(
          md5(concat(a, lit(" "), b))) % buckets.toLong))
      .withColumn("n_bigrams",
        greatest(coalesce(size(col("__bgs")).cast("long"), lit(0L)), lit(0L)))
      .withColumn("weight_q", coalesce(
        aggregate(col("__bgs"), lit(0L),
          (acc, b) => acc + coalesce(element_at(col("lrmap"), b), col("lr0_q"))),
        lit(0L)))
    graft.operators.Mixing.withGumbelKey(
        graft.operators.Sampling.withSplitBucket(weighed, "doc_id", sampleSalt))
      .crossJoin(broadcast(cutRow.select(col("cut").as("__cut"))))
      .filter(col("key_q") > col("__cut"))
      .drop("__t", "__bgs", "lrmap", "lr0_q", "__bucket", "__cut")
  }

  /** Streaming LANGUAGE-ID gate — the q181 classifier's streaming twin
    * (the [[classifierGate]] pattern lifted to K classes): each
    * arriving doc scores against the broadcast ONE-ROW lang-ID
    * artifact ([[graft.operators.LangId.langIdModelRow]] — sorted
    * class list, per-class prior/normalizer maps, per-class
    * bucket→log-count maps) entirely map-side: hashed char trigrams
    * assemble per row, each class's multinomial log-joint is one
    * `aggregate` fold of map lookups, and the argmax folds over the
    * SORTED class array (first strict maximum wins — exactly the
    * batch's score-DESC, class-ASC tiebreak), tracking the runner-up
    * for the margin. ZERO streaming state, append-mode, no watermark.
    *
    * Emits the input columns plus `(n_grams, predicted_lang,
    * margin_q)` — bitwise [[graft.operators.LangId.langIdScores]]'
    * held-out columns on the same corpus (the per-occurrence lookup
    * sum ≡ the batch's occ-grouped Σ occ·lg_q over exact integers;
    * StreamingLangIdGateSpec pins it). NULL/short text scores
    * prior-only (the batch rule); an arrival against an EMPTY model
    * (classless train split) reads predicted NULL, margin NULL —
    * a gate must never crash, and a NULL prediction is the audit
    * signal to not arm it. */
  def langIdGate(stream: DataFrame, model: DataFrame,
      textCol: String = "text", buckets: Int = 8192): DataFrame =
    graft.operators.LangId.scoreAgainstModel(stream, model, textCol, buckets)

  /** Streaming PREDICTED-LANGUAGE distribution monitor — the gate →
    * monitor convention (q144/q158) for the lang-ID line: each
    * micro-batch's arrivals score through the [[langIdGate]] kernel
    * against the broadcast [[graft.operators.LangId.langIdModelRow]]
    * artifact, their predicted-language distribution rolls up onto
    * ≤ K keys, and the exact add-1-smoothed KL against the standing
    * corpus's [[graft.operators.LangId.langDistBaseline]] row closes
    * in 1/64-log2 units ([[graft.operators.LangId.langDistAgainst]] —
    * ONE kernel with the q188 batch twin, so the streamed reading and
    * the batch sheet are bitwise identical;
    * StreamingLangIdGateSpec pins it). Apply inside `foreachBatch`
    * with both one-row artifacts broadcast: ZERO streaming state —
    * the alarm the provenance label can't raise ("this feed switched
    * language") fires per batch with nothing carried between
    * batches. Output: ONE row `(n_docs, n_langs, kl_q, alert)`. */
  def langDistMonitor(batch: DataFrame, model: DataFrame,
      distRow: DataFrame, textCol: String = "text", buckets: Int = 8192,
      alertQ: Long = 32L): DataFrame =
    graft.operators.LangId.langDistAgainst(
      langIdGate(batch, model, textCol, buckets),
      model.select(explode(col("classes")).as("predicted_lang")),
      distRow, alertQ)

  /** Batch twin of the gate with REASON CODES (q81): same quality rules,
    * with the stream's arrival-order dedup pinned to a deterministic
    * rule — among quality-surviving rows of identical normalized
    * content, min id is the keeper, the rest are 'duplicate'. Returns
    * (id, n_tokens, reason, kept); reason precedence too_short →
    * non_english → low_stopword → duplicate → kept mirrors the gate's
    * rules-then-dedup order.
    *
    * Scale shape: the rules ride the scan map-side; dedup is one hash
    * shuffle on md5 of the content (the q23 kernel) plus one
    * co-partitioned join back on the same key — no window, no sort. */
  def batchAudit(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang", minTokens: Int = 20,
      lang: String = "en", stopwordPct: Int = 2): DataFrame =
    auditRows(docs, idCol, textCol, langCol, minTokens, lang, stopwordPct)
      .select(col(idCol), col("n_tokens"), col("reason"), col("kept"))

  /** The audit relation underlying [[batchAudit]] with the caller's
    * columns PRESERVED beside `(n_tokens, reason, kept)` — the shape a
    * downstream grouping (by source, by language, by shard) composes
    * on. Same rules, same deterministic min-id keeper. */
  def auditRows(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang", minTokens: Int = 20,
      lang: String = "en", stopwordPct: Int = 2): DataFrame = {
    val stats = withStats(docs, textCol)
      .withColumn("__h", md5(lower(col(textCol))))
      .withColumn("__q", qualityReason(langCol, minTokens, lang, stopwordPct))
    val keepers = stats.filter(col("__q") === "kept")
      .groupBy(col("__h")).agg(min(col(idCol)).as("__keeper_id"))
    val original = docs.columns.toSeq
    stats.join(keepers, Seq("__h"), "left")
      .select(original.map(col) :+
        col("__n_tokens").as("n_tokens") :+
        when(col("__q") =!= "kept", col("__q"))
          .when(col(idCol) =!= col("__keeper_id"), "duplicate")
          .otherwise("kept").as("reason"): _*)
      .withColumn("kept", when(col("reason") === "kept", 1L).otherwise(0L))
  }

  /** Per-source curation dashboard (q95's companion view of the q81
    * gate): one row per (source, reason) with the doc count and the
    * token mass involved — "which acquisition is failing which rule"
    * at a glance. Token mass sums `greatest(n_tokens, 0)` so the −1
    * null-text sentinel can never deflate a cell; every column is a
    * BIGINT count, so the sheet oracles bitwise on top of q81's
    * already-oracled relation. Scale shape: [[auditRows]]'s audited
    * plan (map-side rules, one md5 shuffle, co-partitioned join back)
    * plus ONE map-side-combined count onto the ≤|sources|×5 key. */
  def sourceAudit(docs: DataFrame, srcCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang", minTokens: Int = 20, lang: String = "en",
      stopwordPct: Int = 2): DataFrame =
    auditRows(docs, idCol, textCol, langCol, minTokens, lang, stopwordPct)
      .groupBy(col(srcCol).as("source"), col("reason"))
      .agg(count(lit(1)).as("n_docs"),
        sum(greatest(col("n_tokens"), lit(0L))).as("n_tokens"))
}
