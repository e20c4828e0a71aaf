package graft.queries

import graft.operators.Similarity

/** Generated DuckDB mirror of [[graft.operators.Similarity.annTopK]]
  * (multi-probe sign-bit LSH top-k).
  *
  * The hyperplanes are seeded literals — the SAME
  * [[Similarity.hyperplanes]] doubles are rendered into the SQL via
  * shortest-round-trip `Double.toString`, which DuckDB parses back to
  * the identical binary double. Dot products are left-fold double on
  * both engines (`graft_dot` ≡ `list_dot_product`, verified bitwise in
  * round 1), so the sign-bit buckets match exactly, and
  * `list_cosine_similarity` ≡ `dot/(‖a‖·‖b‖)` makes the ranking
  * identical — this approximate-search operator oracle-compares
  * EXACTLY, not approximately.
  *
  * Multi-probe mirror: the query side unnests its own bucket plus the
  * `bits` one-bit-flip buckets (`xor(bucket, 1<<j)`), exactly the probe
  * set the Spark side explodes. */
object AnnOracle {

  /** Sign-bit bucket id of the `embedding` column, with the seeded
    * planes rendered as DOUBLE[] literals. */
  private def bucketExpr(bits: Int, seed: Long, dim: Int): String = {
    val planes = Similarity.hyperplanes(dim, bits, seed)
    def planeLit(p: Array[Double]): String =
      p.mkString("[", ", ", "]::DOUBLE[]")
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product(embedding::DOUBLE[], ${planeLit(p)}) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("\n    + ")
  }

  /** `[bucket, bucket^1, bucket^2, ...]` — the multi-probe set. */
  private def probeList(bits: Int): String =
    ("bucket" +: (0 until bits).map(j => s"xor(bucket, ${1L << j})"))
      .mkString("[", ", ", "]")

  def sql(bits: Int = 4, k: Int = 5, qBound: Long = 8, seed: Long = 42L,
      dim: Int = 64): String = {
    val bucketExpr = this.bucketExpr(bits, seed, dim)
    val probeList = this.probeList(bits)
    s"""WITH q0 AS (
       |  SELECT vec_id q_id, embedding::DOUBLE[] v,
       |    $bucketExpr AS bucket
       |  FROM embeddings WHERE vec_id < $qBound AND len(embedding) = $dim),
       |q AS (SELECT q_id, v, unnest($probeList) AS bucket FROM q0),
       |c AS (
       |  SELECT vec_id n_id, embedding::DOUBLE[] v,
       |    $bucketExpr AS bucket
       |  FROM embeddings WHERE len(embedding) = $dim)
       |SELECT q_id, n_id, cos, rank FROM (
       |  SELECT q.q_id, c.n_id, list_cosine_similarity(q.v, c.v) AS cos,
       |    CAST(row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.n_id ASC) AS BIGINT) AS rank
       |  FROM q JOIN c ON q.bucket = c.bucket WHERE q.q_id <> c.n_id) t
       |WHERE rank <= $k""".stripMargin
  }

  /** DuckDB mirror of [[graft.operators.Dedup.embeddingNearDupPairsLsh]]:
    * bucket every vector with the same plane literals, a-side unnests its
    * probe set, b-side keeps its primary bucket, `a_id < b_id`
    * canonicalizes so each pair appears exactly once — no DISTINCT. */
  def pairsSql(threshold: Double, bits: Int = 4, seed: Long = 42L,
      dim: Int = 64): String = {
    val bucketExpr = this.bucketExpr(bits, seed, dim)
    val probeList = this.probeList(bits)
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] ve,
       |    $bucketExpr AS bucket
       |  FROM embeddings WHERE len(embedding) = $dim),
       |a AS (SELECT vec_id a_id, ve a_v, unnest($probeList) AS bucket FROM v),
       |b AS (SELECT vec_id b_id, ve b_v, bucket FROM v)
       |SELECT a_id, b_id, list_cosine_similarity(a_v, b_v) AS cos
       |FROM a JOIN b USING (bucket)
       |WHERE a_id < b_id AND list_cosine_similarity(a_v, b_v) >= $threshold""".stripMargin
  }
}
