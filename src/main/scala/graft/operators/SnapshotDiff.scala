package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the release-engineering view of a corpus:
  * what changed between version N and version N+1? Every corpus
  * release (and every [[Datasheet]] it ships with) needs the delta
  * against the previous cut — docs ADDED by new acquisitions, REMOVED
  * by takedowns / license expiry / curation tightening, MODIFIED by
  * re-crawls, and the silent majority UNCHANGED — because the delta,
  * not the absolute sheet, is what a reviewer signs off on and what
  * an incremental pipeline (q68-style dedup, q82-style ANN
  * maintenance) actually has to process.
  *
  * Determinism design (the QuerySpec contract): membership is key
  * presence, modification is equality of `md5(coalesce(content,''))`
  * — both engine-independent — and the summary sheet is BIGINT doc
  * counts and whitespace-token sums, so everything oracles bitwise.
  * NULL content hashes as the empty string on BOTH sides (a doc whose
  * text is null in both snapshots is `unchanged`, not `modified`);
  * NULL keys join neither snapshot and are dropped.
  *
  * Scale shape: each snapshot is projected map-side to the THIN
  * `(key, source, hash, token-count)` frame BEFORE the join, so the
  * wide content column never reaches an exchange — at 100 TB the
  * full-outer join shuffles ~50 bytes/doc, not documents. One key
  * shuffle per side for the sort-merge full-outer (snapshots stored
  * bucketed by key make it exchange-free), then the summary collapses
  * map-side onto the tiny `(source, status)` key. No corpus-sized
  * state anywhere. */
object SnapshotDiff {

  private def thin(df: DataFrame, keyCol: String, contentCol: String,
      srcCol: String, suffix: String): DataFrame = {
    graft.GraftSession.ensureConfs(df.sparkSession)
    df.filter(col(keyCol).isNotNull).select(
      col(keyCol).as("__k"),
      col(srcCol).as(s"__src_$suffix"),
      md5(coalesce(col(contentCol).cast("string"), lit(""))).as(s"__h_$suffix"),
      graft.functions.TextFunctions.tokenCount(
        coalesce(col(contentCol).cast("string"), lit(""))).as(s"__t_$suffix"),
      lit(1L).as(s"__in_$suffix"))
  }

  private def statusCol: org.apache.spark.sql.Column =
    when(col("__in_o").isNull, lit("added"))
      .when(col("__in_n").isNull, lit("removed"))
      .when(col("__h_o") === col("__h_n"), lit("unchanged"))
      .otherwise(lit("modified"))

  private def joined(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      contentCol: String, srcCol: String): DataFrame =
    thin(oldDf, keyCol, contentCol, srcCol, "o")
      .join(thin(newDf, keyCol, contentCol, srcCol, "n"), Seq("__k"), "full_outer")
      .withColumn("status", statusCol)

  /** Row-level diff: one row per key present in either snapshot —
    * `(key, status)` with `status ∈ added | removed | modified |
    * unchanged`. The feed an incremental downstream consumes. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      contentCol: String, srcCol: String = "source"): DataFrame =
    joined(oldDf, newDf, keyCol, contentCol, srcCol)
      .select(col("__k").as(keyCol), col("status"))

  /** The release sheet: per `(source, status)` — source taken from
    * the NEW snapshot when present, else the old — the doc count and
    * the token mass on each side plus its delta, all BIGINT:
    * `(source, status, n_docs, tokens_old, tokens_new, token_delta)`.
    * Sides absent from a status contribute 0 tokens (an `added` row
    * has `tokens_old = 0`), so `Σ token_delta` over the sheet is the
    * corpus-level token change. */
  def summarize(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      contentCol: String, srcCol: String = "source"): DataFrame =
    joined(oldDf, newDf, keyCol, contentCol, srcCol)
      .groupBy(coalesce(col("__src_n"), col("__src_o")).as("source"),
        col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__t_o"), lit(0L))).as("tokens_old"),
        sum(coalesce(col("__t_n"), lit(0L))).as("tokens_new"))
      .withColumn("token_delta", col("tokens_new") - col("tokens_old"))
}
