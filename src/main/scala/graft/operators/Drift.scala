package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary drift between two corpus slices — the crawl-monitoring
  * step of a training-data pipeline: compare per-term occurrence RATES
  * (not raw counts — slices differ in size) between a reference slice
  * A and a candidate slice B (consecutive crawl snapshots, two
  * sources, pre/post a filter change), and flag terms whose rate moved
  * by more than a threshold factor in either direction. A sudden
  * up-drift marks template/boilerplate injection or a scraper bug; a
  * down-drift marks lost coverage. This is the distribution-shift
  * guard that runs BEFORE a new snapshot is allowed into the mix
  * (complement of [[Mixing]], which reweights already-admitted
  * sources, and of [[Anomaly]], which watches event volumes, not
  * vocabulary).
  *
  * Determinism design (the QuerySpec contract): the rate ratio
  * `(cnt_b/N_b) / (cnt_a/N_a)` is quantized as one BIGINT floor
  * division `(cnt_b · N_a · 2^20) div (cnt_a · N_b)` and the
  * drift tests cross-multiply (`cnt_b · N_a · den > cnt_a · N_b ·
  * num` and its mirror) — all integer, so every column oracles
  * bitwise (the q90 idiom). Terms absent from A report ratio −1 (new
  * vocabulary cannot be rated against a zero base) but still
  * drift-flag upward; terms absent from B flag downward.
  *
  * Scale shape: ONE corpus scan — tokens explode map-side, the
  * (term, slice-membership) counts collapse in a single map-side-
  * combined aggregation keyed on term (conditional sums, not a
  * per-slice re-scan), and slice totals attach via an unpartitioned
  * window over the vocab-sized frame (the q89 idiom — no second
  * corpus pass). Nothing after the one exchange exceeds vocab rows.
  */
object Drift {

  private val Q = 1048576L // 2^20 ratio quantizer

  /** One row per term with `cnt_a + cnt_b ≥ minTotal`:
    * `(term, cnt_a, cnt_b, ratio_q, drift_dir)` where `drift_dir` is
    * +1 (B's rate > num/den × A's), −1 (A's rate > num/den × B's), or
    * 0 (stable). `inA` selects slice-A rows; rows in neither slice
    * are excluded by `inB=false` semantics — pass complementary
    * predicates for a full split. Null text contributes nothing (the
    * q81 totality convention). */
  def termDrift(docs: DataFrame, textCol: String, inA: Column,
      minTotal: Long = 10L, num: Long = 3L, den: Long = 2L): DataFrame = {
    require(minTotal >= 1, s"minTotal must be >= 1, got $minTotal")
    require(num > den && den > 0, s"threshold num/den must exceed 1, got $num/$den")

    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val per = docs.filter(col(textCol).isNotNull)
      .select(inA.as("in_a"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("cnt_b"))
      .withColumn("n_a", sum(col("cnt_a")).over(whole))
      .withColumn("n_b", sum(col("cnt_b")).over(whole))

    per.filter(col("cnt_a") + col("cnt_b") >= minTotal)
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        when(col("cnt_a") > 0,
          expr(s"CAST((cnt_b * n_a * $Q) DIV (cnt_a * n_b) AS BIGINT)"))
          .otherwise(lit(-1L)).as("ratio_q"),
        when(col("cnt_b") * col("n_a") * den > col("cnt_a") * col("n_b") * num, lit(1L))
          .when(col("cnt_a") * col("n_b") * den > col("cnt_b") * col("n_a") * num, lit(-1L))
          .otherwise(lit(0L)).as("drift_dir"))
  }

  /** Population-stability-index monitor over document LENGTH — the
    * distribution-level ingest guard beside [[termDrift]]'s per-term
    * rates: bin the corpus by the STANDING slice's exact length
    * deciles ([[Quantiles.multiQuantileDisc]] edges — the q125 cut
    * kernel), compare the incoming batch's bin occupancy against the
    * standing population, and report the per-bin PSI contributions
    * plus the total and the classic alert verdict. PSI is THE
    * production drift monitor (credit scoring's standard, applied
    * here to the crawl pipeline): it fires when the incoming batch's
    * length distribution no longer matches the corpus the filters
    * were tuned on — truncated scrapes, a boilerplate injection, a
    * changed extraction step — before any content-level signal moves.
    *
    * Determinism design: the incoming split is the q68 md5 membership
    * (`is_new ⇔ bucket < newPermille`); bin rates are EXACT
    * fixed-point `floor(cnt·2^20 / N)` computed in two 10-bit steps
    * (`(cnt·2^10 div N)·2^10 + ((cnt·2^10 mod N)·2^10) div N` — exact
    * BIGINT for any cnt ≤ N < 2^53, so corpus-scale counts never
    * overflow the quantizer); logs are [[Mixing.log2qExpr]]. Each
    * bin's `psi_q = (rs_q − rn_q)·(log2q(rs_q+1) − log2q(rn_q+1))`
    * is ≥ 0 (both factors share a sign — the true PSI property), in
    * 2^26-scaled log2 units; `alert = 1 ⇔ psi_total_q·10 > 3·2^26`
    * (PSI > 0.3 log2 ≈ the classic 0.2 natural-log "significant
    * shift" line). All integers end to end — the sheet oracles
    * bitwise. An empty side reports zero rates rather than dividing
    * by zero; with no standing docs every edge is NULL and all mass
    * bins 0.
    *
    * Output: exactly `bins` rows —
    * `(bin, n_std, n_new, rs_q, rn_q, psi_q, psi_total_q, alert)`.
    *
    * Scale shape (100 TB): ONE pass computes the per-doc length
    * (codegen `graft_tokcount` — text never leaves the scan) onto a
    * 16-byte (is_new, x) frame; the standing decile edges are one
    * broadcast row; binning is a 9-comparison map-side expression; the
    * bin counts collapse in one map-side-combined aggregation onto
    * ≤ `bins` keys, and everything after the single exchange touches
    * `bins` rows. The unpartitioned windows sort 10 rows. */
  def lengthPsi(docs: DataFrame, textCol: String = "text",
      newPermille: Int = 100, bins: Int = 10,
      salt: String = "graft"): DataFrame = {
    require(newPermille >= 0 && newPermille <= 1000,
      s"newPermille must be in [0,1000], got $newPermille")
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val flagged = Sampling.withSplitBucket(docs, "doc_id", salt)
      .withColumn("__new", col("__bucket") < newPermille)
    val model = lengthPsiModel(flagged.filter(!col("__new")), textCol, bins)
    psiAgainstModel(flagged.filter(col("__new")), model, textCol, bins)
  }

  /** The PSI monitor's STANDING artifact — what a production system
    * persists beside its tokenizer and Bloom filter and broadcasts to
    * ingest (the [[graft.operators.Phrases.unigramCostMap]]
    * convention applied to the drift family): ONE row holding the
    * standing slice's exact decile edges (`e1..e{bins−1}`, the
    * q60-pinned [[Quantiles.multiQuantileDisc]] selection), its
    * per-bin occupancy as a `map<bin, count>` and the total count.
    * Built once from the standing corpus; every arriving batch
    * compares against it via [[psiAgainstModel]] without ever
    * re-touching the standing data. An empty standing slice yields
    * NULL edges and an empty map — every downstream bin then reads
    * zero standing mass (the q144 totality rule). */
  def lengthPsiModel(standing: DataFrame, textCol: String = "text",
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    graft.GraftSession.ensureConfs(standing.sparkSession)
    val qs = psiEdgeNames(bins)
    val base = Dedup.materialize(
      standing.select(graft.functions.TextFunctions.tokenCount(
        coalesce(col(textCol), lit(""))).as("x")))
    // distributed radix select (bitwise percentile_disc) — the
    // standing frame is corpus-sized, so the constant-group
    // multiQuantileDisc idiom would funnel it through one task
    val edges = Quantiles.globalQuantileDisc(base, "x", qs,
      materializeInput = false) // base is already materialized
    val counts = base.crossJoin(broadcast(edges))
      .select(psiBinOf(qs).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val cm = standing.sparkSession.range(0, bins).toDF("bin")
      .select(col("bin").cast("long").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"))
      .agg(
        map_from_entries(array_sort(
          collect_list(struct(col("bin"), col("n"))))).as("std_map"),
        sum(col("n")).as("t_std"))
    edges.crossJoin(cm)
  }

  /** One incoming batch scored against a standing [[lengthPsiModel]]
    * row — the per-micro-batch kernel of the STREAMING drift monitor
    * (apply inside `foreachBatch`, the model broadcast; zero
    * streaming state — each batch is its own comparison unit, which
    * is exactly PSI's semantics) and the closing half of the batch
    * [[lengthPsi]] (q144), which single-sources through here so the
    * streaming sheet and the batch sheet CANNOT disagree. Output
    * schema and arithmetic are exactly q144's:
    * `(bin, n_std, n_new, rs_q, rn_q, psi_q, psi_total_q, alert)`.
    *
    * Scale shape: the model is one broadcast row; binning is a
    * ≤ 9-comparison map-side expression over the batch's 8-byte
    * length frame; counts collapse map-side onto ≤ `bins` keys and
    * everything after the single exchange touches `bins` rows. */
  def psiAgainstModel(batch: DataFrame, model: DataFrame,
      textCol: String = "text", bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    graft.GraftSession.ensureConfs(batch.sparkSession)
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val qs = psiEdgeNames(bins)
    val counts = batch
      .select(graft.functions.TextFunctions.tokenCount(
        coalesce(col(textCol), lit(""))).as("x"))
      .crossJoin(broadcast(model))
      .select(psiBinOf(qs).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("__nn"))
    def rate(cnt: String, n: String) = expr(
      s"""CASE WHEN $n = 0 THEN CAST(0 AS BIGINT)
         |ELSE (($cnt * 1024) DIV $n) * 1024 + ((($cnt * 1024) % $n) * 1024) DIV $n
         |END""".stripMargin)
    batch.sparkSession.range(0, bins).toDF("bin")
      .select(col("bin").cast("long").as("bin"))
      .join(counts, Seq("bin"), "left")
      .crossJoin(broadcast(model.select(col("std_map"), col("t_std"))))
      .select(col("bin"),
        coalesce(element_at(col("std_map"), col("bin")), lit(0L)).as("n_std"),
        coalesce(col("__nn"), lit(0L)).as("n_new"),
        coalesce(col("t_std"), lit(0L)).as("t_std"))
      .withColumn("t_new", sum(col("n_new")).over(whole))
      .withColumn("rs_q", rate("n_std", "t_std"))
      .withColumn("rn_q", rate("n_new", "t_new"))
      .withColumn("psi_q",
        (col("rs_q") - col("rn_q")) *
          (expr(Mixing.log2qExpr("rs_q + 1")) - expr(Mixing.log2qExpr("rn_q + 1"))))
      .withColumn("psi_total_q", sum(col("psi_q")).over(whole))
      .select(col("bin"), col("n_std"), col("n_new"), col("rs_q"), col("rn_q"),
        col("psi_q"), col("psi_total_q"),
        when(col("psi_total_q") * 10L > 3L * 67108864L, lit(1L))
          .otherwise(lit(0L)).as("alert"))
  }

  /** Per-SOURCE length PSI — the drift family's member of the
    * acquisition-level ablation (q153 gates / q154 dedup / q155
    * content): which feed's length PROFILE diverges from the corpus
    * it feeds, the form-side complement of q155's content fingerprint
    * (a scrape of tweets and a scrape of legal filings can share
    * vocabulary yet bin nowhere near each other). Every source's docs
    * are binned against the CORPUS-WIDE standing model
    * ([[lengthPsiModel]] over all docs — one broadcast row) and
    * scored with exactly q144's PSI arithmetic, rolled to one row per
    * source: `(source, n_docs, psi_q, alert)`; `alert` fires at the
    * same PSI > 0.3 industry line (psi_q·10 > 3·2^26). A dominant
    * source whose docs span every corpus bin reads near-zero; note a
    * bin the source has ZERO mass in while the corpus has plenty
    * legitimately inflates its PSI (the classic zero-bin term — the
    * smoothed log keeps it finite, not small), so a big feed CAN
    * alarm when a concentrated foreign mass occupies a bin it never
    * touches. NULL sources group as the literal 'unknown' (the q76
    * idiom).
    *
    * Determinism: decile edges are the q60-pinned exact selection;
    * rates are the two-step fixed point; logs are [[Mixing
    * .log2qExpr]] — all-BIGINT, bitwise oracle.
    *
    * Scale shape (100 TB): ONE pass computes per-doc lengths
    * (codegen `graft_tokcount`); binning is a ≤ 9-comparison map-side
    * expression against the broadcast model row; counts collapse
    * map-side onto (source, bin) keys — the only corpus-driven
    * exchange; everything after touches a sources × bins grid built
    * by exploding a literal bin sequence. */
  def lengthPsiBySource(docs: DataFrame, textCol: String = "text",
      bins: Int = 10): DataFrame = {
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val base = docs.filter(col("doc_id").isNotNull)
    psiBySourceAgainstModel(base, lengthPsiModel(base, textCol, bins),
      textCol, bins)
  }

  /** One incoming batch scored PER SOURCE against a standing
    * [[lengthPsiModel]] row — the q156 sheet with the standing corpus
    * in the model seat (the [[psiAgainstModel]] relationship applied
    * to the per-source member): apply inside `foreachBatch` with the
    * model broadcast, zero streaming state. [[lengthPsiBySource]]
    * single-sources through here (its model IS its own corpus's), so
    * the streamed per-source sheet and the q156 batch sheet CANNOT
    * disagree on the same input (StreamingScorecardSpec pins it).
    * NULL-doc_id rows are excluded HERE (not left to the caller), the
    * q156 contract — unlike the KL sibling, whose q155 contract never
    * filters ids. Output: one row per source in the batch —
    * `(source, n_docs, psi_q, alert)`, q156's exact arithmetic.
    *
    * Scale shape: the model is one broadcast row; binning is a
    * ≤ 9-comparison map-side expression; counts collapse map-side
    * onto (source, bin) keys — the only batch-driven exchange; the
    * closing grid is sources × bins. */
  def psiBySourceAgainstModel(batch0: DataFrame, model: DataFrame,
      textCol: String = "text", bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    graft.GraftSession.ensureConfs(batch0.sparkSession)
    val batch = batch0.filter(col("doc_id").isNotNull)
    val qs = psiEdgeNames(bins)
    val counts = batch
      .select(coalesce(col("source"), lit("unknown")).as("source"),
        graft.functions.TextFunctions.tokenCount(
          coalesce(col(textCol), lit(""))).as("x"))
      .crossJoin(broadcast(model))
      .select(col("source"), psiBinOf(qs).as("bin"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("__nn"))
    val srcs = batch
      .select(coalesce(col("source"), lit("unknown")).as("source")).distinct()
    val wsrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).rowsBetween(Long.MinValue, Long.MaxValue)
    def rate(cnt: String, n: String) = expr(
      s"""CASE WHEN $n = 0 THEN CAST(0 AS BIGINT)
         |ELSE (($cnt * 1024) DIV $n) * 1024 + ((($cnt * 1024) % $n) * 1024) DIV $n
         |END""".stripMargin)
    srcs
      .select(col("source"),
        explode(expr(s"sequence(CAST(0 AS BIGINT), CAST(${bins - 1} AS BIGINT))"))
          .as("bin"))
      .join(counts, Seq("source", "bin"), "left")
      .crossJoin(broadcast(model.select(col("std_map"), col("t_std"))))
      .select(col("source"), col("bin"),
        coalesce(element_at(col("std_map"), col("bin")), lit(0L)).as("n_std"),
        coalesce(col("__nn"), lit(0L)).as("n_new"),
        coalesce(col("t_std"), lit(0L)).as("t_std"))
      .withColumn("t_new", sum(col("n_new")).over(wsrc))
      .withColumn("rs_q", rate("n_std", "t_std"))
      .withColumn("rn_q", rate("n_new", "t_new"))
      .withColumn("__psi_bin_q",
        (col("rs_q") - col("rn_q")) *
          (expr(Mixing.log2qExpr("rs_q + 1")) - expr(Mixing.log2qExpr("rn_q + 1"))))
      .groupBy(col("source"))
      .agg(max(col("t_new")).as("n_docs"),
        sum(col("__psi_bin_q")).as("psi_q"))
      .withColumn("alert",
        when(col("psi_q") * 10L > 3L * 67108864L, lit(1L)).otherwise(lit(0L)))
  }

  /** The content-drift monitor's STANDING artifact — the
    * [[lengthPsiModel]] convention applied to WHAT the corpus says
    * instead of how long it is: ONE row holding the standing slice's
    * hashed-bigram bucket occupancy (the q126/q155 DSIR feature
    * space) as a `map<bucket, count>` plus the total count. Built
    * once, broadcast to ingest; an empty standing slice yields an
    * empty map and t_g = 0 — every probe then reads the
    * uniform-vs-uniform zero (totality, not a crash). */
  def contentKlModel(standing: DataFrame, textCol: String = "text",
      buckets: Int = 8192): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    graft.GraftSession.ensureConfs(standing.sparkSession)
    bigramBuckets(standing, textCol, buckets)
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .agg(
        map_from_entries(array_sort(
          collect_list(struct(col("b"), col("c"))))).as("bmap"),
        coalesce(sum(col("c")), lit(0L)).as("t_g"))
  }

  /** One incoming batch scored against a standing [[contentKlModel]]
    * row — the content-side sibling of [[psiAgainstModel]] (apply
    * inside `foreachBatch`, the model broadcast, ZERO streaming
    * state; each batch is its own comparison unit): the exact
    * add-1-smoothed KL(P_batch ‖ P_standing) over the hashed-bigram
    * buckets, q155's arithmetic with the batch in the source seat and
    * the standing model in the corpus seat. Catches what length PSI
    * can't — a feed whose bigram-distribution SHAPE changes at the
    * same length: template injection and boilerplate storms
    * (concentration spikes), frequency-skew flips (a language or
    * encoder change upstream of a scraper). Two calibrated limits,
    * both safe-side: hashed features see concentration, not identity
    * — a 1-for-1 vocabulary substitution at matched frequencies
    * hashes to the same near-uniform profile (pair with the q136 OOV
    * audit for vocabulary novelty); and the +1 smoothing shrinks
    * batches far smaller than `buckets` toward zero (a 100-doc probe
    * batch cannot false-alarm; production micro-batches at ingest
    * scale carry bigram mass ≫ 8192 and read true KL).
    *
    * Output: ONE row `(n_bigrams, n_buckets, kl_q, alert)`; `kl_q` in
    * 1/64-log2 units (trunc-toward-zero through the explicit sign
    * CASE), `alert` fires at `kl_q ≥ alertQ` (default 32 = 0.5 bits —
    * a batch half a bit from the standing distribution per bigram is
    * not the same feed). A batch whose bucket counts EQUAL the
    * standing slice's reads EXACTLY zero — every Δ_b cancels before
    * quantization (the +1 smoothing preserves equality, not
    * proportionality). All-BIGINT → the batch twin (q158) oracles
    * bitwise.
    *
    * Scale shape: bigrams collapse map-side onto `buckets` keys — the
    * only batch-driven exchange; the scoring grid is `buckets` rows
    * built by exploding a literal sequence against the ONE broadcast
    * model row; the closing sum is a single-row aggregate. */
  def klAgainstModel(batch: DataFrame, model: DataFrame,
      textCol: String = "text", buckets: Int = 8192,
      alertQ: Long = 32L): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    graft.GraftSession.ensureConfs(batch.sparkSession)
    val counts = bigramBuckets(batch, textCol, buckets)
      .groupBy(col("b")).agg(count(lit(1)).as("c_bb"))
    // the batch total rides an unpartitioned window over the
    // buckets-sized grid (the q144 t_new idiom) instead of a separate
    // aggregate branch — one less scan of the batch
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    batch.sparkSession.range(1).select(
        explode(expr(s"sequence(CAST(0 AS BIGINT), CAST(${buckets - 1} AS BIGINT))"))
          .as("b"))
      .join(counts, Seq("b"), "left")
      .crossJoin(broadcast(model))
      .select(col("b"),
        coalesce(col("c_bb"), lit(0L)).as("c_bb"),
        coalesce(element_at(col("bmap"), col("b")), lit(0L)).as("c_gb"),
        coalesce(col("t_g"), lit(0L)).as("t_g"))
      .withColumn("t_b", sum(col("c_bb")).over(whole))
      .withColumn("__dq",
        expr(Mixing.log2qExpr("c_bb + 1")) - expr(Mixing.log2qExpr(s"t_b + $buckets")) -
          expr(Mixing.log2qExpr("c_gb + 1")) + expr(Mixing.log2qExpr(s"t_g + $buckets")))
      .agg(max(col("t_b")).as("n_bigrams"),
        sum(when(col("c_bb") > 0L, 1L).otherwise(0L)).as("n_buckets"),
        sum((col("c_bb") + 1L) * col("__dq")).as("__num"))
      .withColumn("kl_q", expr(
        s"""CASE WHEN __num >= 0 THEN __num DIV (n_bigrams + $buckets)
           |ELSE -((-__num) DIV (n_bigrams + $buckets)) END""".stripMargin))
      .withColumn("alert",
        when(col("kl_q") >= alertQ, lit(1L)).otherwise(lit(0L)))
      .drop("__num")
  }

  /** One incoming batch scored PER SOURCE against a standing
    * [[contentKlModel]] row — the q155 fingerprint with a standing
    * corpus in the model seat (the content-side sibling of
    * [[psiBySourceAgainstModel]]): apply inside `foreachBatch` with
    * the model broadcast, zero streaming state. Single-sourced with
    * the q155 batch sheet through [[graft.operators.Mixing
    * .sourceBigramBuckets]] (the feature rows) and [[graft.operators
    * .Mixing.klPerSourceClose]] (the closing arithmetic) — when the
    * model is the batch corpus's own [[contentKlModel]], the output
    * is bitwise [[graft.operators.Mixing.sourceKlDivergence]]'s
    * (StreamingScorecardSpec pins it). Output: one row per source in
    * the batch — `(source, n_bigrams, n_buckets, kl_q)`.
    *
    * Scale shape: bigrams collapse map-side onto (source, bucket)
    * keys — the only batch-driven exchange; the scoring grid is
    * sources × buckets with the one model row broadcast in. */
  def klBySourceAgainstModel(batch: DataFrame, model: DataFrame,
      textCol: String = "text", buckets: Int = 8192): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    graft.GraftSession.ensureConfs(batch.sparkSession)
    val sb = graft.operators.Dedup.materialize(
      Mixing.sourceBigramBuckets(batch, textCol, buckets)
        .groupBy(col("b"), col("source")).agg(count(lit(1)).as("c_sb")))
    val ts = sb.groupBy(col("source")).agg(sum(col("c_sb")).as("t_s"))
    val srcs = batch
      .select(coalesce(col("source"), lit("unknown")).as("source")).distinct()
    val grid = srcs.join(ts, Seq("source"), "left")
      .select(col("source"), coalesce(col("t_s"), lit(0L)).as("t_s"),
        explode(expr(s"sequence(CAST(0 AS BIGINT), CAST(${buckets - 1} AS BIGINT))"))
          .as("b"))
      .join(sb, Seq("source", "b"), "left")
      .crossJoin(broadcast(model))
      .select(col("source"), col("t_s"),
        coalesce(col("c_sb"), lit(0L)).as("c_sb"),
        coalesce(element_at(col("bmap"), col("b")), lit(0L)).as("c_gb"),
        coalesce(col("t_g"), lit(0L)).as("t_g"))
    Mixing.klPerSourceClose(grid, buckets)
  }

  /** The q158 batch twin: the corpus split on the q68 md5 bucket
    * (`newPermille` per-mille as the incoming slice), the standing
    * remainder folded into [[contentKlModel]], the incoming slice
    * scored by [[klAgainstModel]] — single-sourced through the same
    * two kernels as the streaming monitor, so the batch sheet and a
    * streamed batch CANNOT disagree (StreamingContentDriftSpec pins
    * it). */
  def contentKlDrift(docs: DataFrame, textCol: String = "text",
      newPermille: Int = 100, buckets: Int = 8192,
      salt: String = "graft"): DataFrame = {
    require(newPermille >= 0 && newPermille <= 1000,
      s"newPermille must be in [0,1000], got $newPermille")
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val flagged = Sampling.withSplitBucket(docs, "doc_id", salt)
      .withColumn("__new", col("__bucket") < newPermille)
    val model = contentKlModel(flagged.filter(!col("__new")), textCol, buckets)
    klAgainstModel(flagged.filter(col("__new")), model, textCol, buckets)
  }

  /** The shared hashed-bigram feature rows `(b)` — one row per bigram
    * OCCURRENCE, md5-48 mod `buckets` (the q126/q155 feature space,
    * one textual definition for the model builder and the probe). */
  private def bigramBuckets(docs: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    docs.filter(col(textCol).isNotNull)
      .select(explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
      .select((Dedup.md5Base48Of(md5(concat(col("p.0"), lit(" "), col("p.1"))))
        % buckets.toLong).as("b"))
  }

  /** The named decile fractions `e1..e{bins−1}` shared by the model
    * builder and the bin expression. */
  private def psiEdgeNames(bins: Int): Seq[(String, Double)] =
    (1 until bins).map { i =>
      s"e$i" -> (BigDecimal(i) / BigDecimal(bins)).toDouble
    }

  /** The ≤ 9-comparison bin expression over a length column `x` and
    * the model's edge columns. NULL edges (empty standing corpus)
    * compare false, binning all mass at 0 — the q144 totality rule. */
  private def psiBinOf(qs: Seq[(String, Double)]): Column =
    qs.map { case (n, _) =>
      when(col("x") > col(n), lit(1L)).otherwise(lit(0L)) }.reduce(_ + _)
}
