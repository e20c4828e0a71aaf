package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Precision contract: all vector math is left-fold double —
  * `aggregate(zip_with(a,b,·*·), 0.0, +)` — which is bitwise identical
  * to DuckDB's `list_dot_product`/`list_cosine_similarity` on
  * `DOUBLE[]` (verified empirically), so cosine values oracle-compare
  * exactly, not approximately.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * streams the corpus — one pass, no shuffle until the final per-query
  * top-k window on k·|queries| rows. The ANN path buckets the corpus by
  * random-hyperplane sign bits (seeded, deterministic): probe cost drops
  * to the matching bucket(s); recall is measured against brute force in
  * the spec rather than assumed.
  */
object Similarity {

  /** Left-fold double dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity: dot/(‖a‖·‖b‖), each norm a left-fold sqrt. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force exact top-k: for each query vector, the k nearest
    * corpus vectors by cosine (self-match excluded), ranked with a
    * deterministic id tiebreak. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("q_v"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("n_v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_v"), col("n_v")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes (seeded) for sign-bit LSH. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for a vector column: bit j = (v · h_j) >= 0.
    * Planes are injected as array literals so the whole computation
    * stays codegen'd — no UDF. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    planes.zipWithIndex.map { case (p, j) =>
      val plane = array(p.map(lit): _*)
      when(dot(v, plane) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate top-k: bucket corpus and queries by sign-bit LSH and
    * rank only within the query's bucket. `bits` trades recall for
    * probe cost: expected bucket size |corpus| / 2^bits. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    val planes = hyperplanes(dim, bits, seed)
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("q_v"))
      .withColumn("bucket", lshBucket(col("q_v"), planes))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("n_v"))
      .withColumn("bucket", lshBucket(col("n_v"), planes))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    c.join(broadcast(q), "bucket")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_v"), col("n_v")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
