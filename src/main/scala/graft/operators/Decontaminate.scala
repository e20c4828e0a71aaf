package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test contamination detection — the n-gram overlap audit every
  * LLM training pipeline runs before shipping an eval split: find
  * training documents that share verbatim 3-gram shingles with any
  * held-out test document.
  *
  * The split is the deterministic md5-bucket membership of
  * [[Sampling.sampleByKey]] (same salt ⇒ the test split IS the q55
  * sample — one split definition across the pipeline), so the report
  * is a pure function of the data.
  *
  * Scale shape (100 TB): the join key is the shingle string, and raw
  * shingle joins explode on stop-phrase shingles ("of the and" appears
  * in a large fraction of any corpus — a quadratic hot key). The
  * document-frequency cap (`maxShingleDf`) drops those before the
  * join — exactly what production decontamination does, because a
  * shingle shared by thousands of documents carries no contamination
  * signal anyway. After the cap, per-shingle fan-out is bounded by
  * maxShingleDf on each side, so the join is linear in shingle volume
  * with a constant-bounded multiplier. Distinct-shingle counting is a
  * two-level aggregate (expand + partial agg), never a per-group set
  * in driver memory.
  */
object Decontaminate {

  /** One row per contaminated training document:
    * (train_id, n_shared_shingles, n_test_docs) — how many distinct
    * capped shingles it shares with the test split and how many test
    * documents it overlaps. Rows with NULL doc_id are excluded (no
    * stable split membership — the [[Sampling.sampleByKey]] rule). */
  def contaminationReport(
      docs: DataFrame,
      testPermille: Int = 100,
      maxShingleDf: Long = 20L,
      minOverlap: Long = 3L,
      salt: String = "graft"): DataFrame =
    contaminationReportFromShingles(docs, Dedup.shingleRows(docs),
      testPermille, maxShingleDf, minOverlap, salt)

  /** [[contaminationReport]] over a precomputed (doc_id, sh) shingle
    * frame (the [[Dedup.shingleRows]] shape; positional rows fine — the
    * distinct below owns set semantics). A pipeline that also runs
    * shingle-based dedup (q71) should [[Dedup.materialize]] ONE shingle
    * frame and feed both — the shingle pass is a full window shuffle of
    * the token stream, the most expensive stage of either consumer.
    *
    * CONTRACT: `shingles` must be the shingle rows of this SAME `docs`
    * frame (document membership decides the train/test split, shingles
    * supply the overlap evidence — they must describe the same corpus).
    * Passing a subset's shingles (e.g. train-only) cannot be detected
    * here without an extra pass and silently UNDER-reports: test docs
    * with no shingle rows contribute no overlap, and a contaminated
    * train doc ships. When in doubt, use [[contaminationReport]], which
    * derives both from one frame by construction. */
  def contaminationReportFromShingles(
      docs: DataFrame,
      shingles: DataFrame,
      testPermille: Int = 100,
      maxShingleDf: Long = 20L,
      minOverlap: Long = 3L,
      salt: String = "graft"): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000,
      s"testPermille must be in [0,1000], got $testPermille")
    val membership = Sampling.withSplitBucket(docs.select(col("doc_id")), "doc_id", salt)
      .select(col("doc_id"), (col("__bucket") < testPermille).as("is_test"))
    // distinct (doc, shingle) with the split tag; referenced by the df
    // cap AND the capped join below — materialized so the shingle
    // pipeline runs once
    val sh = Dedup.materialize(
      shingles.distinct().join(membership, "doc_id"))
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select(col("sh"))
    val capped = Dedup.materialize(sh.join(rare, Seq("sh"), "left_semi"))
    val trainSh = capped.filter(!col("is_test"))
      .select(col("doc_id").as("train_id"), col("sh"))
    val testSh = capped.filter(col("is_test"))
      .select(col("doc_id").as("test_id"), col("sh"))
    trainSh.join(testSh, "sh")
      .groupBy(col("train_id"))
      .agg(countDistinct(col("sh")).as("n_shared_shingles"),
        countDistinct(col("test_id")).as("n_test_docs"))
      .filter(col("n_shared_shingles") >= minOverlap)
  }
}
