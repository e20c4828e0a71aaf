package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The supervised quality classifier — the fastText-style keep gate
  * the published pretraining pipelines run beside the unsupervised
  * filters (GPT-3's curated-reference classifier, Brown et al. 2020
  * appendix A; LLaMA's Wikipedia-reference fastText; CCNet's LM is
  * the UNsupervised sibling, shipped as q125): train a multinomial
  * Naive Bayes model over hashed-bigram features on a LABELED train
  * split, then score every held-out document with the log-odds of the
  * positive ("curated-like") class. NB with hashed n-gram features is
  * the linear-classifier shape fastText reduces to at depth 0 — and
  * unlike SGD it has a CLOSED FORM, so the whole train→apply→eval
  * chain is a deterministic relational computation both engines
  * evaluate bitwise.
  *
  * Determinism design (the q126 DSIR conventions throughout):
  * features are md5-48 hashed bigrams mod `buckets`; the train/apply
  * split is the standing md5 split ([[Sampling.withSplitBucket]]);
  * counts are BIGINTs; every log is [[Mixing.log2qExpr]] — fixed-point
  * base-2, 1/64-log2 units, exact integers end to end. The score
  * decomposes so unseen buckets cost ZERO lookup:
  * `score = prior_q + Σ_b occ_b·u_q(b) + n_bigrams·k_q` with
  * `u_q(b) = log2q(cp+1) − log2q(cn+1)` (0 when the train split never
  * saw bucket b — exactly the +1-smoothed NB value) and the constant
  * `k_q = log2q(tcn+B) − log2q(tcp+B)` folding both normalizers
  * per-occurrence; `prior_q = log2q(np+1) − log2q(nn+1)` over the
  * text-bearing train docs. `predicted = (score_q ≥ 0)` is the
  * maximum-a-posteriori decision.
  *
  * Scale shape (100 TB): bigrams assemble map-side and collapse onto
  * (doc, bucket) count keys before any join; the model sheet is
  * `buckets`-sized (8192 rows) and the totals/prior frame ONE row —
  * both BROADCAST into the scoring join (a production system persists
  * them as the model artifact and ships them to ingest workers); the
  * per-doc sum combines map-side on the one doc_id exchange. Nothing
  * corpus-sized moves except the 24-byte (doc, bucket) count rows —
  * the audited q126 shape plus one extra broadcast. Per-doc score
  * magnitudes are bounded by doc length · (2·64·43), corpus-size
  * independent; the corpus-scale totals enter only through log2q,
  * which is total over the full positive BIGINT domain. */
object Classifier {

  /** Train on the md5 split's first `trainPermille` buckets, score the
    * REST (the held-out docs a deployment actually gates). `positive`
    * is the label column evaluated on each document row (e.g.
    * `col("source").isin("wiki", "books")` — the curated-reference
    * membership the published pipelines label with).
    *
    * Output, one row per held-out doc with a non-null id:
    * `(doc_id, n_bigrams, score_q, predicted, actual)` — score in
    * 1/64-log2 units, predicted/actual as 0/1 BIGINTs. Docs with null
    * text or < 2 tokens carry no features and score prior-only. */
  def nbQualityScores(docs: DataFrame, positive: Column,
      textCol: String = "text", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame = {
    val (meta, hb, sheet, consts) =
      parts(docs, positive, textCol, trainPermille, buckets, salt)
    val perDoc = hb.filter(!col("__train"))
      .join(broadcast(sheet), Seq("b"), "left")
      .groupBy(col("doc_id")).agg(
        sum(col("occ")).as("n_bigrams"),
        sum(col("occ") * coalesce(col("u_q"), lit(0L))).as("s_feat"))
    meta.filter(!col("__train")).select(col("doc_id"), col("__pos"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (col("prior_q") + coalesce(col("s_feat"), lit(0L))
          + coalesce(col("n_bigrams"), lit(0L)) * col("k_q")).as("score_q"),
        col("__pos"))
      .select(col("doc_id"), col("n_bigrams"), col("score_q"),
        when(col("score_q") >= 0L, lit(1L)).otherwise(lit(0L)).as("predicted"),
        when(col("__pos"), lit(1L)).otherwise(lit(0L)).as("actual"))
  }

  /** The trained model collapsed to ONE broadcastable row —
    * `(bmap: map<bucket, u_q>, prior_q, k_q)` — what a production
    * system persists as the classifier artifact and ships to every
    * ingest worker beside its tokenizer and Bloom filter (the
    * [[graft.operators.Phrases.unigramCostMap]] convention applied to
    * the quality family). Single-sourced with [[nbQualityScores]]:
    * both build from the same split/feature/sheet chain, so the
    * streaming gate's scores are bitwise the batch sheet's. */
  def nbModelRow(docs: DataFrame, positive: Column,
      textCol: String = "text", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame = {
    val (_, _, sheet, consts) =
      parts(docs, positive, textCol, trainPermille, buckets, salt)
    sheet
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("b"), col("u_q"))))).as("bmap"))
      .crossJoin(broadcast(consts))
  }

  /** The classifier's operating-point sheet — the threshold-picking
    * report a deployment reads before wiring the gate: the held-out
    * scores swept at their own exact DECILE thresholds (the
    * q60-pinned [[Quantiles.multiQuantileDisc]] selection — data-
    * driven cut candidates, not arbitrary constants), one row per
    * distinct threshold with the integer confusion counts
    * (`predict positive ⇔ score_q ≥ thr_q`) and precision/recall.
    * GPT-3's appendix documents exactly this knob (they kept
    * documents by a score-vs-Pareto-draw rule tuned on such a sweep);
    * this sheet is how the cut gets chosen with evidence.
    *
    * Determinism: thresholds are SELECTED existing score values;
    * counts are BIGINTs; precision/recall are single IEEE divisions
    * of exact integers (−1.0 when undefined, the q90 idiom) — the
    * whole sheet oracles bitwise.
    *
    * Scale shape: the held-out score frame (16-byte rows) is swept
    * against ≤ 9 broadcast threshold rows — a 9× map-side row
    * multiplication collapsing map-side onto ≤ 9 keys; the decile
    * computation is one sort of the score frame (the q76 kernel). */
  def operatingPoints(docs: DataFrame, positive: Column,
      textCol: String = "text", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): DataFrame = {
    val scores = Dedup.materialize(
      nbQualityScores(docs, positive, textCol, trainPermille, buckets, salt)
        .select(col("score_q"), col("actual")))
    val qs = (1 until 10).map { i =>
      s"e$i" -> (BigDecimal(i) / BigDecimal(10)).toDouble
    }
    // distributed radix select (bitwise percentile_disc) — held-out
    // scores are corpus-sized at scale; no single-task sort
    val cutsRow = Quantiles.globalQuantileDisc(scores, "score_q", qs,
      materializeInput = false) // scores is already materialized
    val thr = cutsRow
      .select(explode(array(qs.map { case (n, _) => col(n) }: _*)).as("thr_q"))
      .filter(col("thr_q").isNotNull).distinct()
    scores.crossJoin(broadcast(thr))
      .groupBy(col("thr_q"))
      .agg(
        sum(when(col("actual") === 1L && col("score_q") >= col("thr_q"),
          lit(1L)).otherwise(lit(0L))).as("tp"),
        sum(when(col("actual") === 0L && col("score_q") >= col("thr_q"),
          lit(1L)).otherwise(lit(0L))).as("fp"),
        sum(when(col("actual") === 1L && col("score_q") < col("thr_q"),
          lit(1L)).otherwise(lit(0L))).as("fn"),
        sum(when(col("actual") === 0L && col("score_q") < col("thr_q"),
          lit(1L)).otherwise(lit(0L))).as("tn"))
      .select(col("thr_q"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0L, lit(-1.0))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp")))
          .as("precision"),
        when(col("tp") + col("fn") === 0L, lit(-1.0))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn")))
          .as("recall"))
  }

  /** The classifier's reliability (calibration) sheet — the
    * rank-calibration readout a deployment reads BESIDE the
    * [[operatingPoints]] sweep: held-out scores binned by their own
    * exact decile edges (the q60-pinned [[Quantiles.multiQuantileDisc]]
    * selection, the q144 binning kernel), and per bin the empirical
    * positive rate. A threshold gate needs the score to be
    * RANK-calibrated — higher score band ⇒ higher true-positive
    * rate — and NB is notoriously over-confident in probability space
    * (Niculescu-Mizil & Caruana 2005), so the per-band empirical rate,
    * not the sigmoid of the score, is the evidence that score order
    * can be trusted; the per-bin `mono` flag marks exactly the bands
    * where the reliability curve inverts (DeGroot & Fienberg 1983's
    * reliability diagram as a relational sheet).
    *
    * Determinism: bin edges are SELECTED existing score values;
    * counts are BIGINTs; `rate_q` is the exact two-step fixed-point
    * `floor(n_pos·2^20 / n)` (the q144 rate kernel — exact for any
    * n_pos ≤ n < 2^53); `mono` compares each non-empty band's BIGINT
    * rate against the LAST non-empty band below it. The whole sheet
    * oracles bitwise. Empty bins (score ties collapsing a decile
    * edge) report n = 0, NULL score bounds, rate −1 (the q90
    * undefined idiom) and mono = 1 — an empty band can't invert the
    * curve, and skipping it keeps the flag meaningful across the
    * gap.
    *
    * Output: exactly `bins` rows —
    * `(bin, n, n_pos, min_s, max_s, rate_q, mono)`.
    *
    * Scale shape (100 TB): the held-out score frame (16-byte rows)
    * crosses ONE broadcast edge row; binning is a ≤ 9-comparison
    * map-side expression; counts collapse map-side onto ≤ `bins`
    * keys, and everything after the single exchange — including the
    * two unpartitioned windows — touches `bins` rows. */
  def calibrationSheet(docs: DataFrame, positive: Column,
      textCol: String = "text", trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft",
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val scores = Dedup.materialize(
      nbQualityScores(docs, positive, textCol, trainPermille, buckets, salt)
        .select(col("score_q"), col("actual")))
    val qs = (1 until bins).map { i =>
      s"e$i" -> (BigDecimal(i) / BigDecimal(bins)).toDouble
    }
    // distributed radix select (bitwise percentile_disc) — same
    // no-single-task-sort rationale as [[operatingPoints]]
    val edges = Quantiles.globalQuantileDisc(scores, "score_q", qs,
      materializeInput = false) // scores is already materialized
    val binOf = qs.map { case (n, _) =>
      when(col("score_q") > col(n), lit(1L)).otherwise(lit(0L)) }.reduce(_ + _)
    val counts = scores.crossJoin(broadcast(edges))
      .select(binOf.as("bin"), col("score_q"), col("actual"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(col("actual")).as("n_pos"),
        min(col("score_q")).as("min_s"),
        max(col("score_q")).as("max_s"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy().orderBy(col("bin"))
    docs.sparkSession.range(0, bins).toDF("bin")
      .select(col("bin").cast("long").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        col("min_s"), col("max_s"))
      .withColumn("rate_q", expr(
        """CASE WHEN n = 0 THEN CAST(-1 AS BIGINT)
          |ELSE ((n_pos * 1024) DIV n) * 1024 + (((n_pos * 1024) % n) * 1024) DIV n
          |END""".stripMargin))
      .withColumn("__pr", last(when(col("n") > 0L, col("rate_q")), ignoreNulls = true)
        .over(ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("mono",
        when(col("n") === 0L || col("__pr").isNull
          || col("__pr") <= col("rate_q"), lit(1L)).otherwise(lit(0L)))
      .drop("__pr")
  }

  /** The shared split → hashed-bigram → per-(doc, bucket) count →
    * model-sheet chain: returns (meta, hb, sheet, consts). */
  private def parts(docs: DataFrame, positive: Column, textCol: String,
      trainPermille: Int, buckets: Int, salt: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(trainPermille >= 0 && trainPermille <= 1000,
      s"trainPermille must be in [0,1000], got $trainPermille")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val meta = Sampling.withSplitBucket(docs, "doc_id", salt)
      .select(col("doc_id"), col(textCol).as("__text"), positive.as("__pos"),
        (col("__bucket") < trainPermille).as("__train"))
    val toks = graft.functions.TextFunctions.tokens(col("__text"))
    val base = meta.filter(col("__text").isNotNull)
      .select(col("doc_id"), col("__train"), col("__pos"),
        explode(arrays_zip(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
      .select(col("doc_id"), col("__train"), col("__pos"),
        (Dedup.md5Base48Of(md5(concat(col("p.0"), lit(" "), col("p.1"))))
          % buckets.toLong).as("b"))
    val hb = Dedup.materialize(
      base.groupBy(col("doc_id"), col("__train"), col("__pos"), col("b"))
        .agg(count(lit(1)).as("occ")))
    // the model sheet: per-bucket +1-smoothed log-count difference,
    // train side only; buckets the train split never saw are ABSENT
    // and contribute the mathematically-correct 0
    val sheet = hb.filter(col("__train"))
      .groupBy(col("b")).agg(
        sum(when(col("__pos"), col("occ")).otherwise(lit(0L))).as("cp"),
        sum(when(!col("__pos"), col("occ")).otherwise(lit(0L))).as("cn"))
      .withColumn("u_q",
        expr(Mixing.log2qExpr("cp + 1")) - expr(Mixing.log2qExpr("cn + 1")))
      .select(col("b"), col("u_q"))
    // the one-row constants frame: normalizers + class prior
    val consts = meta.filter(col("__train")).agg(
        sum(when(col("__pos") && col("__text").isNotNull, lit(1L)).otherwise(lit(0L))).as("np"),
        sum(when(!col("__pos") && col("__text").isNotNull, lit(1L)).otherwise(lit(0L))).as("nn"))
      .crossJoin(hb.filter(col("__train")).agg(
        coalesce(sum(when(col("__pos"), col("occ")).otherwise(lit(0L))), lit(0L)).as("tcp"),
        coalesce(sum(when(!col("__pos"), col("occ")).otherwise(lit(0L))), lit(0L)).as("tcn")))
      .select(
        (expr(Mixing.log2qExpr("np + 1")) - expr(Mixing.log2qExpr("nn + 1"))).as("prior_q"),
        (expr(Mixing.log2qExpr(s"tcn + $buckets"))
          - expr(Mixing.log2qExpr(s"tcp + $buckets"))).as("k_q"))
    (meta, hb, sheet, consts)
  }
}
