package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary growth curve (Heaps'-law sheet) — the tokenizer-sizing
  * step of a training-data pipeline: as the corpus is ingested in
  * doc-id order, how fast does the set of distinct terms grow relative
  * to tokens read? The curve's flattening rate (Heaps' β, public:
  * Heaps 1978) tells you whether a vocabulary budget saturates or
  * keeps paying, and a bucket whose `new_terms` jumps off-trend marks
  * an injected template or a scraper bug the same way [[Drift]] does
  * between two slices — this is the single-corpus, cumulative view.
  *
  * Determinism design (the QuerySpec contract): every column is a
  * BIGINT count or an exact integer bucket — `bucket = (id · K) div
  * (max_id + 1)` is one integer floor division — so the sheet oracles
  * bitwise with no quantization step at all. First occurrence is
  * `min(doc_id)` per term: order-independent, unlike a scan-order
  * "first seen" which would change under partitioning.
  *
  * Scale shape: THREE corpus passes, each collapsing map-side before
  * its one exchange — (1) a doc_id-only scan for `max(doc_id)`
  * (column-pruned to one BIGINT column, materialized and broadcast as
  * a 1-row frame — the q80 idiom; it is [[Dedup.materialize]]d
  * because BOTH per-row branches consume it and Spark re-plans an
  * un-shared subtree per consumer, which would run the bound scan
  * twice; bucketing needs the corpus bound BEFORE any per-row work,
  * so an unpartitioned window is not an option short of sorting the
  * corpus); (2) a per-bucket doc/token volume scan (map-side
  * `size(tokens)`, combine on the ≤K-row bucket key); (3) the
  * first-occurrence scan — explode tokens map-side into a
  * map-side-combined `min(doc_id)` agg keyed on term, after which
  * nothing exceeds vocab rows. Branches (2) and (3) read the corpus
  * at different grains (per-doc vs per-term); sharing them would mean
  * materializing a corpus-sized frame — a rescan of column-pruned
  * parquet is strictly cheaper. The closing join and the cumulative
  * window run over the ≤K-row bucket frame.
  */
object VocabGrowth {

  /** One row per doc-id bucket (K = `buckets`, equal-width over
    * `[0, max_id]`): `(bucket, n_docs, n_tokens, new_terms, docs_cum,
    * tokens_cum, vocab_cum)` — `vocab_cum` is the distinct-term count
    * after reading buckets `0..k`, i.e. the Heaps curve. Buckets with
    * docs but no first occurrences report `new_terms = 0`; empty
    * buckets (sparse doc_id ranges) are absent by rule — cumulative
    * columns stay correct because the window sums what exists. Null
    * text contributes nothing (the q81 totality convention: such docs
    * are dropped before tokenization AND before the doc count, so
    * `n_docs` counts the tokenizable corpus). */
  def growthCurve(docs: DataFrame, textCol: String, idCol: String = "doc_id",
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")

    val texts = docs.filter(col(textCol).isNotNull)
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    // 1-row corpus bound, broadcast onto both per-row branches (the
    // q80 idiom). max() ignores null ids; +1 keeps max_id itself in
    // bucket K-1. Materialized ([[Dedup.materialize]]): both branches
    // consume it, and Spark re-plans an un-shared subtree per consumer
    // — without this the doc_id-only bound scan runs twice.
    val maxF = broadcast(Dedup.materialize(
      docs.agg(max(col(idCol)).cast("long").as("max_id"))))
    val bucket =
      expr(s"CAST((CAST($idCol AS BIGINT) * $buckets) DIV (max_id + 1) AS BIGINT)")
        .as("bucket")

    val volume = texts.select(col(idCol), size(toks).cast("long").as("n_toks"))
      .crossJoin(maxF).select(bucket, col("n_toks"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))

    val firsts = texts.select(col(idCol), explode(toks).as("term"))
      .groupBy(col("term")).agg(min(col(idCol)).cast("long").as("first_id"))
      .crossJoin(maxF)
      .select(expr(s"CAST((first_id * $buckets) DIV (max_id + 1) AS BIGINT)").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_terms"))

    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    volume.join(firsts, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .withColumn("docs_cum", sum(col("n_docs")).over(cum))
      .withColumn("tokens_cum", sum(col("n_tokens")).over(cum))
      .withColumn("vocab_cum", sum(col("new_terms")).over(cum))
  }
}
