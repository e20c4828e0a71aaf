package graft.queries

/** Generated DuckDB mirror of
  * [[graft.operators.Similarity.annRecallAudit]]: the exact
  * brute-force arm ([[bruteForceSql]], shared with the q30 spec), the
  * IVF arm ([[IvfOracle.sql]]) and the LSH arm ([[AnnOracle.sql]])
  * embedded as CTE subqueries, closed by the per-(query, method) hit
  * count against the exact top-k. */
object AnnRecallOracle {

  /** Mirror of [[graft.operators.Similarity.bruteForceTopK]] over
    * queries `vec_id < qBound` — exact cosine top-k with the
    * (cos DESC, n_id ASC) total order. The single source for the q30
    * oracle AND the recall audit's exact arm. */
  def bruteForceSql(qBound: Long = 8, k: Int = 5): String =
    s"""WITH q AS (SELECT vec_id q_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id < $qBound),
       |c AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings)
       |SELECT q_id, n_id, cos, rank FROM (
       |  SELECT q.q_id, c.n_id, list_cosine_similarity(q.v, c.v) AS cos,
       |    CAST(row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.n_id ASC) AS BIGINT) AS rank
       |  FROM q, c WHERE q.q_id <> c.n_id) t
       |WHERE rank <= $k""".stripMargin

  /** q117: (q_id, method, n_returned, n_hits, recall) per query vector
    * and ANN family. `recall` is n_hits / k — two identical integers
    * divided by an identical literal, IEEE-identical on both
    * engines. */
  def sql(nlist: Int = 16, nprobe: Int = 4, bits: Int = 4, k: Int = 5,
      qBound: Long = 8, seed: Long = 42L, iters: Int = 2,
      dim: Int = 64): String =
    s"""WITH exact AS (SELECT q_id, n_id FROM (
       |${bruteForceSql(qBound, k)}
       |)),
       |ivf AS (SELECT q_id, n_id FROM (
       |${IvfOracle.sql(nlist, nprobe, k, qBound, iters, dim)}
       |)),
       |lsh AS (SELECT q_id, n_id FROM (
       |${AnnOracle.sql(bits, k, qBound, seed, dim)}
       |)),
       |appr AS (SELECT q_id, n_id, 'ivf' AS method FROM ivf
       |         UNION ALL SELECT q_id, n_id, 'lsh' AS method FROM lsh)
       |SELECT a.q_id, a.method,
       |  CAST(count(*) AS BIGINT) AS n_returned,
       |  CAST(coalesce(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
       |  CAST(coalesce(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS DOUBLE) / $k AS recall
       |FROM appr a LEFT JOIN exact e ON e.q_id = a.q_id AND e.n_id = a.n_id
       |GROUP BY a.q_id, a.method""".stripMargin

  /** q149 mirror of [[graft.operators.Similarity.prefixRecallAudit]]:
    * the exact arm shared with q30/q117, one prefix-ranked arm per
    * truncation length (list slices `v[1:dp]`, the same
    * `list_cosine_similarity` chain, zero-norm prefixes excluded on
    * both sides), closed by the per-(query, method) hit count. */
  def prefixSql(dims: Seq[Int] = Seq(8, 16, 32, 64), k: Int = 5,
      qBound: Long = 8): String = {
    val armCtes = dims.map { dp =>
      s"""arm$dp AS (SELECT q_id, n_id, 'd$dp' AS method FROM (
         |  SELECT q_id, n_id,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |      ORDER BY list_cosine_similarity(qv, nv) DESC, n_id ASC) AS BIGINT) AS rank
         |  FROM (SELECT q.q_id, c.n_id, q.v[1:$dp] AS qv, c.v[1:$dp] AS nv
         |        FROM q, c WHERE q.q_id <> c.n_id
         |          AND list_dot_product(q.v[1:$dp], q.v[1:$dp]) > 0
         |          AND list_dot_product(c.v[1:$dp], c.v[1:$dp]) > 0) p
         |  ) r WHERE rank <= $k)""".stripMargin
    }.mkString(",\n")
    val armUnion = dims.map(dp =>
      s"SELECT q_id, n_id, method FROM arm$dp").mkString("\n         UNION ALL ")
    s"""WITH q AS (SELECT vec_id q_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id < $qBound),
       |c AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings),
       |exact AS (SELECT q_id, n_id FROM (
       |  SELECT q.q_id, c.n_id,
       |    CAST(row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.n_id ASC) AS BIGINT) AS rank
       |  FROM q, c WHERE q.q_id <> c.n_id) t
       |  WHERE rank <= $k),
       |$armCtes,
       |appr AS ($armUnion)
       |SELECT a.q_id, a.method,
       |  CAST(count(*) AS BIGINT) AS n_returned,
       |  CAST(coalesce(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
       |  CAST(coalesce(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS DOUBLE) / $k AS recall
       |FROM appr a LEFT JOIN exact e ON e.q_id = a.q_id AND e.n_id = a.n_id
       |GROUP BY a.q_id, a.method""".stripMargin
  }

  /** q151 mirror of [[graft.operators.Similarity.rpDistortionAudit]]:
    * the seeded projection planes rendered as DOUBLE[] literals (the
    * q46 convention), distances via the dot-product identity
    * `‖a−b‖² = ‖a‖²+‖b‖²−2a·b` (`list_dot_product` ≡ `graft_dot`
    * bitwise), the floor-quantized ratio and the per-query bounds. */
  def rpDistortionSql(kDim: Int = 16, seed: Long = 42L, dim: Int = 64,
      qBound: Long = 8): String = {
    val planes = graft.operators.Similarity.hyperplanes(dim, kDim, seed)
    val scale = math.sqrt(kDim.toDouble)
    def planeLit(p: Array[Double]): String =
      p.mkString("[", ", ", "]::DOUBLE[]")
    val projList = planes.map(p =>
      s"list_dot_product(v, ${planeLit(p)}) / $scale")
      .mkString("[\n      ", ",\n      ", "\n    ]::DOUBLE[]")
    s"""WITH q AS (SELECT vec_id q_id, embedding::DOUBLE[] v, $projList AS p
       |  FROM embeddings
       |  WHERE vec_id < $qBound AND embedding IS NOT NULL AND len(embedding) = $dim),
       |c AS (SELECT vec_id n_id, embedding::DOUBLE[] v, $projList AS p
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim),
       |pairs AS (SELECT q.q_id,
       |    list_dot_product(q.v, q.v) + list_dot_product(c.v, c.v)
       |      - 2.0 * list_dot_product(q.v, c.v) AS do2,
       |    list_dot_product(q.p, q.p) + list_dot_product(c.p, c.p)
       |      - 2.0 * list_dot_product(q.p, c.p) AS dp2
       |  FROM q, c WHERE q.q_id <> c.n_id)
       |SELECT q_id, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN do2 > 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_degenerate,
       |  CAST(min(CASE WHEN do2 > 0
       |    THEN CAST(floor(dp2 / do2 * 1048576.0) AS BIGINT) END) AS BIGINT) AS min_ratio_q,
       |  CAST(max(CASE WHEN do2 > 0
       |    THEN CAST(floor(dp2 / do2 * 1048576.0) AS BIGINT) END) AS BIGINT) AS max_ratio_q
       |FROM pairs GROUP BY q_id""".stripMargin
  }

  /** q135 mirror of [[graft.operators.Similarity.rrfFusionTopK]]:
    * the three arm rankings replayed by their own generators (lsh /
    * refined-IVF / PQ ADC at the shipped q46/q49/q130 parameters),
    * fused by the exact-integer reciprocal-rank score
    * `2^20 DIV (rrfK + rank)` summed per (query, candidate) — every
    * value BIGINT, rank by (rrf_q DESC, n_id ASC). */
  def rrfSql(nlist: Int = 16, nprobe: Int = 4, bits: Int = 4, k: Int = 5,
      qBound: Long = 8, seed: Long = 42L, iters: Int = 2, dim: Int = 64,
      m: Int = 4, ksub: Int = 8, pqIters: Int = 2, rrfK: Int = 60): String =
    s"""WITH lshr AS (SELECT q_id, n_id, rank FROM (
       |${AnnOracle.sql(bits, k, qBound, seed, dim)}
       |)),
       |ivfr AS (SELECT q_id, n_id, rank FROM (
       |${IvfOracle.sql(nlist, nprobe, k, qBound, iters, dim)}
       |)),
       |pqr AS (SELECT q_id, n_id, rank FROM (
       |${PqOracle.adcTopKSql(m, ksub, pqIters, k, qBound, dim)}
       |)),
       |u AS (SELECT * FROM lshr UNION ALL SELECT * FROM ivfr
       |      UNION ALL SELECT * FROM pqr),
       |f AS (SELECT q_id, n_id, CAST(count(*) AS BIGINT) AS n_arms,
       |        CAST(sum(1048576 // ($rrfK + rank)) AS BIGINT) AS rrf_q
       |      FROM u GROUP BY 1, 2)
       |SELECT q_id, n_id, n_arms, rrf_q, rank FROM (
       |  SELECT q_id, n_id, n_arms, rrf_q,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY rrf_q DESC, n_id ASC) AS BIGINT) AS rank
       |  FROM f) t
       |WHERE rank <= $k""".stripMargin
}
