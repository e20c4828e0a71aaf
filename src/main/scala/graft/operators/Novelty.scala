package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document novelty score — the dedup-priority / curriculum
  * signal: what fraction of a document's distinct 3-token shingles
  * appear NOWHERE else in the corpus? A near-1 score marks genuinely
  * fresh material worth keeping even at low quality; a near-0 score
  * marks boilerplate assembled from corpus-common phrases even when
  * no single near-dup pair fires (the complement of [[Dedup]]'s
  * pairwise view — novelty is a per-doc marginal, not a pair
  * relation).
  *
  * Determinism design (the QuerySpec contract): counts are BIGINT,
  * `novelty_q = (n_unique · 2^20) div n_sh` is one integer floor
  * division, and the majority-novel flag cross-multiplies — bitwise
  * oracled (the q90 idiom). The shingle vocabulary is the established
  * q28 shape (lower-cased whitespace tokens, 3-gram concat), so the
  * DuckDB mirror reuses the MinhashOracle `sh` CTE verbatim.
  *
  * Scale shape: the document-frequency question needs NO corpus-wide
  * (doc_id, shingle) distinct — shingles are deduplicated DOC-LOCALLY
  * map-side (`array_distinct` over the codegen `graft_ngrams` array,
  * before the explode), after which a plain count keyed on shingle IS
  * document frequency. One map-side-combined agg on the shingle key,
  * one co-partitioned join back (AQE handles the hot-shingle skew),
  * one doc-keyed count — the (doc_id, sh) frame is
  * [[Dedup.materialize]]d because both the df agg and the join-back
  * consume it. */
object Novelty {

  private val Q = 1048576L // 2^20 ratio quantizer

  /** One row per document with ≥1 shingle (docs under 3 tokens are
    * absent by rule — they have no 3-gram vocabulary to rate):
    * `(doc_id, n_sh, n_unique, novelty_q, is_novel)` where `n_sh`
    * counts the doc's DISTINCT shingles, `n_unique` those with corpus
    * df = 1, and `is_novel` fires when unique shingles are the
    * majority (2·n_unique > n_sh). Null text contributes nothing (the
    * q81 totality convention). */
  def noveltyScores(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val sh = Dedup.materialize(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol).as("doc_id"),
          explode(array_distinct(graft.functions.TextFunctions.tokenNgrams(
            split(lower(col(textCol)), "\\s+"), 3))).as("sh")))
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_sh"), col("n_unique"),
        expr(s"CAST((n_unique * $Q) DIV n_sh AS BIGINT)").as("novelty_q"),
        when(lit(2L) * col("n_unique") > col("n_sh"), 1L).otherwise(0L)
          .as("is_novel"))
  }
}
