package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source near-duplicate overlap matrix — the provenance view of
  * dedup: which SOURCES copy from each other? Syndicated wire stories,
  * scraped mirrors, and licensed re-dumps all show up as a hot
  * (src_a, src_b) cell long before anyone inspects individual pairs,
  * and the within-source diagonal separates "this feed re-posts
  * itself" from "these two feeds share a supplier". The sheet decides
  * which acquisition to deprecate; [[Mixing]] then reweights what
  * remains.
  *
  * Determinism design (the QuerySpec contract): the pair relation is
  * [[Dedup.nearDupPairs]] — already bitwise-oracled end-to-end by q28
  * (shared permutation family, exact-integer minhash, one IEEE
  * division for the Jaccard verify) — and this sheet only ADDS two
  * key joins and BIGINT counts on top, so it oracles bitwise by
  * construction. Source pairs are canonicalized `least/greatest` so
  * an (A,B) and a (B,A) collision land in one cell regardless of
  * doc-id order.
  *
  * Scale shape: everything upstream is the audited q28 pipeline
  * (banded candidates, bucket-local quadratic, candidate-bounded
  * verify). The provenance joins are keyed on doc_id against the
  * THIN (doc_id, source) projection — the verified pair relation is
  * collision-bounded and far smaller, so both joins broadcast it in
  * practice and never shuffle more than the pruned two-column scan.
  * The closing count collapses map-side onto the ≤|sources|² key.
  */
object SourceOverlap {

  /** One row per unordered source pair with ≥1 verified near-dup pair:
    * `(src_a, src_b, n_pairs)` with `src_a ≤ src_b`; the diagonal
    * (`src_a = src_b`) counts within-source duplication. `threshold`
    * is the exact-Jaccard verify bound of [[Dedup.nearDupPairs]]. */
  def overlapMatrix(docs: DataFrame, srcCol: String = "source",
      numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame =
    overlapMatrixFromPairs(
      Dedup.nearDupPairs(docs, numHashes, rowsPerBand, threshold), docs, srcCol)

  /** The composed-pipeline entry (the `FromShingles`/`FromComponents`
    * idiom): build the sheet from a STANDING verified pair relation
    * (`a_id`, `b_id`) so a pipeline that already ran the q28 pair
    * pipeline — or [[Dedup.crossNearDupPairs]] renamed onto the same
    * keys — pays only the two thin provenance joins and the map-side
    * count, never a second shingle pass. [[overlapMatrix]] is this
    * plus the standalone pair build. */
  def overlapMatrixFromPairs(pairs: DataFrame, docs: DataFrame,
      srcCol: String = "source"): DataFrame = {
    val src = docs.select(col("doc_id"), col(srcCol).as("__src"))
    pairs
      .join(src.select(col("doc_id").as("a_id"), col("__src").as("__sa")), Seq("a_id"))
      .join(src.select(col("doc_id").as("b_id"), col("__src").as("__sb")), Seq("b_id"))
      .select(least(col("__sa"), col("__sb")).as("src_a"),
        greatest(col("__sa"), col("__sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
