package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for the LLM-data-pipeline surface: exact,
  * MinHash+LSH near-dup, n-gram Jaccard verification, and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-shuffle on the content hash — the same
  *    kernel as the CDC upsert precombine;
  *  - MinHash+LSH is the classic shingle→signature→band→bucket-join
  *    pipeline: cost is O(docs × shingles) map-side + one shuffle per
  *    explode stage; candidate verification touches only bucket
  *    collisions (quadratic ONLY within a bucket, not globally);
  *  - all hashing is md5/xxhash64 Catalyst expressions — no UDFs, the
  *    shingle/signature stages stay in WholeStageCodegen;
  *  - embedding near-dup is bucketless brute force here (bounded ids for
  *    the oracle query); the LSH-bucketed scale path lives in
  *    [[Similarity.annTopK]].
  */
object Dedup {

  /** Exact dedup by content hash: one group per distinct (normalized)
    * text, keeping the minimum id as the canonical copy. */
  def exactGroups(docs: DataFrame, text: Column = col("text"), id: Column = col("doc_id")): DataFrame =
    docs.groupBy(md5(lower(text)).as("h"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Keep one row per distinct text (the min-id row). */
  def dropExactDuplicates(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(lower(col("text")))).orderBy(col("doc_id").asc)
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signatures: doc_id, hash index i ∈ [0,numHashes), sig =
    * min over shingles of md5(i ∥ '|' ∥ shingle). The i-prefixed md5
    * family is a public standard trick for k independent permutations
    * and is exactly reproducible in the DuckDB oracle. */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 16): DataFrame =
    docs.select(col("doc_id"), explode(TextFunctions.shingles3(col("text"))).as("sh"))
      .select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("i"))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit("|"), col("sh")))).as("sig"))

  /** LSH bands: group `rowsPerBand` consecutive signatures, hash the
    * ordered concatenation. Docs sharing any band hash are candidates. */
  def lshBands(sigs: DataFrame, rowsPerBand: Int = 4): DataFrame =
    sigs.withColumn("band", floor(col("i") / rowsPerBand))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(array_join(transform(array_sort(collect_list(struct(col("i"), col("sig")))),
        x => x.getField("sig")), ",")).as("bh"))

  /** Candidate pairs (a_id < b_id) sharing at least one band bucket.
    * The self-join shuffles on (band, bh) — bucket-local quadratic only. */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("bh"), col("doc_id").as("a_id"))
    val b = bands.select(col("band"), col("bh"), col("doc_id").as("b_id"))
    a.join(b, Seq("band", "bh")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Jaccard similarity of the two docs' distinct shingle sets. */
  private def jaccard(aSh: Column, bSh: Column): Column =
    size(array_intersect(aSh, bSh)).cast("double") /
      size(array_distinct(concat(aSh, bSh)))

  /** Full near-dup pipeline: MinHash → LSH candidates → exact n-gram
    * Jaccard verification at `threshold`. Returns (a_id, b_id, jacc). */
  def nearDupPairs(docs: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val cands = candidatePairs(lshBands(minhashSignatures(docs, numHashes), rowsPerBand))
    val sh = docs.select(col("doc_id"), TextFunctions.shingles3(col("text")).as("sh"))
    cands
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"), jaccard(col("a_sh"), col("b_sh")).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** Embedding-cosine near-dup pairs among ids < `idBound` (the bound
    * keeps the O(n²) oracle-checkable slice small; the unbounded scale
    * path goes through LSH bucketing in [[Similarity]]). */
  def embeddingNearDupPairs(embs: DataFrame, threshold: Double, idBound: Long): DataFrame = {
    val e = embs.filter(col("vec_id") < idBound)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("b_v"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        Similarity.cosine(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
