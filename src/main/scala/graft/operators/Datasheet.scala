package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus datasheet — the one-page "datasheet for datasets" summary
  * (Gebru et al. 2018, public) a corpus release ships with: volume,
  * vocabulary, provenance spread, duplication, curation yield, and the
  * document-length median, as a single long-format `(metric, value)`
  * sheet every other operator's numbers can be sanity-checked against.
  *
  * Determinism design (the QuerySpec contract): every value is a
  * BIGINT count or an exact rank-picked integer (the q60 decimal-exact
  * percentile kernel) — no ratios, no floats — so the sheet oracles
  * bitwise. Long format keeps the schema closed under adding metrics.
  *
  * Scale shape: one corpus pass per GRAIN (five parquet scans — the
  * curation grain pays two, see (4)), each collapsing
  * map-side before its exchange — (1) the scalar sheet: one aggregation
  * computing row/text/token totals and the lang / source / content-hash
  * distincts together (Spark plans multi-distinct as ONE scan + Expand
  * ×3 with partial aggregation — one pass over parquet, not three
  * scans); (2) the vocabulary count: explode → two-stage distinct on
  * the term key; (3) the median: the q60 one-window-sort quantile
  * kernel over the per-doc token frame; (4) curation yield: q81's
  * audited rules + md5-keyed keeper plan (two scans — the keeper
  * branch rescans rather than materializing corpus-sized stats, that
  * operator's documented trade). Grains differ (corpus
  * scalars / term / ordered doc / content hash), so sharing passes
  * would materialize corpus-sized state — rescanning column-pruned
  * parquet is the cheaper trade, and a datasheet runs once per
  * release, not per query. The closing union is nine 1-row frames. */
object Datasheet {

  /** The long-format sheet: one `(metric, value)` row each for
    * n_docs, n_text_docs (non-null text), n_tokens (whitespace tokens,
    * null text counting 0), n_langs, n_sources, n_exact_dup_docs
    * (text docs minus distinct lower-cased content hashes),
    * n_distinct_terms, p50_doc_tokens (exact median over text docs),
    * and curation_kept_docs (q81 rules + dedup survivors). */
  def summarize(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", srcCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val texts = docs.filter(col(textCol).isNotNull)
    val toks = graft.functions.TextFunctions.tokens(col(textCol))

    val scalars = docs.agg(
        count(lit(1)).as("n_docs"),
        count(col(textCol)).as("n_text_docs"),
        sum(coalesce(graft.functions.TextFunctions.tokenCount(col(textCol)),
          lit(0L))).as("n_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        countDistinct(col(srcCol)).as("n_sources"),
        countDistinct(md5(lower(col(textCol)))).as("n_distinct_content"))
      .selectExpr("stack(6, " +
        "'n_docs', n_docs, " +
        "'n_text_docs', n_text_docs, " +
        "'n_tokens', n_tokens, " +
        "'n_langs', n_langs, " +
        "'n_sources', n_sources, " +
        "'n_exact_dup_docs', n_text_docs - n_distinct_content" +
        ") AS (metric, value)")

    val vocab = texts.select(explode(toks).as("term"))
      .agg(countDistinct(col("term")).as("value"))
      .select(lit("n_distinct_terms").as("metric"), col("value"))

    // distributed radix select (bitwise percentile_disc) over the
    // corpus-sized token-count frame — no single-task sort
    val median = Quantiles.globalQuantileDisc(
        texts.select(graft.functions.TextFunctions
          .tokenCount(col(textCol)).as("n_toks")),
        "n_toks", Seq(("p50", 0.5)))
      .select(lit("p50_doc_tokens").as("metric"), col("p50").as("value"))

    val kept = graft.streaming.Curation
      .batchAudit(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        col(textCol).as("text")))
      .agg(sum(col("kept")).as("value"))
      .select(lit("curation_kept_docs").as("metric"), col("value"))

    scalars.union(vocab).union(median).union(kept)
  }
}
