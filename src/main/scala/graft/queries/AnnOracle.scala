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

  def sql(bits: Int = 4, k: Int = 5, qBound: Long = 8, seed: Long = 42L,
      dim: Int = 64): String = {
    val planes = Similarity.hyperplanes(dim, bits, seed)
    def planeLit(p: Array[Double]): String =
      p.mkString("[", ", ", "]::DOUBLE[]")
    val bucketExpr = planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product(embedding::DOUBLE[], ${planeLit(p)}) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("\n    + ")
    val probeList = ("bucket" +: (0 until bits).map(j => s"xor(bucket, ${1L << j})"))
      .mkString("[", ", ", "]")
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
}
