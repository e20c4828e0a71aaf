package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranked lexical retrieval over the document corpus — the BM25 member
  * the text family was missing: dedup (q23/q28), decontamination
  * (q66/q116) and quality filters (q74/q125) decide what ENTERS a
  * corpus; retrieval is how an eval owner, a RAG pipeline, or a
  * contamination analyst asks "which training documents does this
  * query pull up, and how hard". Robertson/Spärck Jones BM25
  * (Robertson & Zaragoza 2009, public) with the Lucene idf variant.
  *
  * Determinism design (the engine's standing contract — approximate
  * ranking functions made integer-exact so even scores oracle
  * bitwise):
  *
  *  - idf: `(N − df + 0.5)/(df + 0.5) + 1 = (2N + 2)/(2df + 1)` —
  *    both sides integers, so
  *    `idf_q = log2q(2N + 2) − log2q(2df + 1)` under the exact
  *    fixed-point log2 kernel ([[Mixing.log2qExpr]], 1/64-log2
  *    units, defined BIGINT truncations; the q126 precedent). A libm
  *    `ln` would diverge across engines — and only rescales scores,
  *    never reorders a single formulation.
  *  - tf saturation: `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` at
  *    the standard k1 = 1.2, b = 0.75, with `avgdl` the INTEGER mean
  *    document length (`T DIV N` — an engine convention, documented:
  *    the sub-token rounding shifts every score identically).
  *    Multiplying through by 10·avgdl makes it the exact integer
  *    quotient `tfq = (22·tf·avgdl·2^10) DIV
  *    (10·avgdl·tf + 3·avgdl + 9·dl)` ∈ [0, 2253] — bounded at ANY
  *    corpus size, so per-term scores `idf_q·tfq` and their per-pair
  *    BIGINT sums can never overflow and are order-independent.
  *
  * Common-term pruning is part of the contract, not an optimization
  * flag: terms with train-side df > `dfCap` are EXCLUDED from scoring
  * (their idf is ~zero and their posting lists are the entire
  * corpus). This is Lucene's max-doc-frequency discipline, and it is
  * what bounds the join: every surviving term's posting list has
  * ≤ dfCap entries, so the query⋈postings join emits
  * ≤ |query terms|·dfCap rows per eval document — a constant, not a
  * corpus fraction.
  *
  * Scale shape (100 TB): ONE token pass builds (doc, term, tf)
  * postings with map-side combine; df/dl/stats are one aggregation
  * each (stats is a broadcast one-row frame); the scoring join
  * shuffles on the term key once with df-capped fan-out, and the
  * per-(eval, train) sum combines map-side before the closing pair
  * exchange. The top-k window partitions by eval doc — query-side
  * bounded. Nothing quadratic, no text column past the token pass.
  *
  * Output: one row per retrieved pair —
  * `(eval_id, train_id, score_q, rank)`, rank by (score_q DESC,
  * train_id ASC), `rank ≤ k`; eval docs whose in-cap terms hit no
  * training document emit nothing (nothing was retrievable).
  */
object Retrieval {

  /** BM25 top-k training documents per eval-split query document.
    * The eval split is THE q55 md5-bucket membership
    * (`bucket < evalPermille` — the q66 convention), each eval doc's
    * query = its distinct in-cap tokens. */
  def bm25TopK(docs: DataFrame, k: Int = 5, evalPermille: Int = 50,
      dfCap: Long = 100L, textCol: String = "text",
      salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(evalPermille >= 0 && evalPermille <= 1000,
      s"evalPermille must be in [0,1000], got $evalPermille")
    require(dfCap >= 1, s"dfCap must be >= 1, got $dfCap")
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val toks = Sampling.withSplitBucket(docs.filter(col(textCol).isNotNull),
        "doc_id", salt)
      .select(col("doc_id"), (col("__bucket") < evalPermille).as("__eval"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("t"))
      .filter(length(col("t")) >= 1)
    // train-side postings: (doc, term, tf) — the ONE corpus collapse
    val train = Dedup.materialize(
      toks.filter(!col("__eval"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf")))
    val dl = train.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"),
        expr("CAST(tot DIV n_docs AS BIGINT)").as("avgdl"),
        expr(Mixing.log2qExpr("2 * n_docs + 2")).as("idf_num_q"))
    val dfSheet = train.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .crossJoin(broadcast(stats))
      .select(col("t"),
        (col("idf_num_q") - expr(Mixing.log2qExpr("2 * df + 1"))).as("idf_q"))
    val postings = train.join(dl, "doc_id")
      .join(dfSheet, "t")
      .crossJoin(broadcast(stats.select(col("avgdl"))))
      .select(col("t"), col("doc_id").as("train_id"),
        (col("idf_q") *
          expr("CAST((22 * tf * avgdl * 1024) DIV " +
            "(10 * avgdl * tf + 3 * avgdl + 9 * dl) AS BIGINT)")).as("s_t"))
    val qterms = toks.filter(col("__eval"))
      .select(col("doc_id").as("eval_id"), col("t")).distinct()
    val w = Window.partitionBy(col("eval_id"))
      .orderBy(col("score_q").desc, col("train_id").asc)
    qterms.join(postings, "t")
      .groupBy(col("eval_id"), col("train_id"))
      .agg(sum(col("s_t")).as("score_q"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
