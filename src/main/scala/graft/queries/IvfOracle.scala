package graft.queries

/** Generated DuckDB mirror of [[graft.operators.Similarity.ivfTopK]]
  * (IVF-flat approximate top-k), optionally preceded by `iters` rounds
  * of [[graft.operators.Similarity.kmeansIterate]] Lloyd refinement.
  *
  * Fully relational — unlike [[AnnOracle]] no literals are injected:
  * the seed centroids are themselves corpus rows (`vec_id < nlist`, the
  * deterministic sample), and every refinement round is unrolled as the
  * same assign → quantized-mean CTE chain the Spark side executes. All
  * cosines are left-fold double on both engines (`graft_dot` ≡
  * `list_cosine_similarity`, bitwise); the centroid mean accumulates
  * `floor(x·2²⁰)` in exact BIGINT (order-independent) with one double
  * division at the end, so refined centroids — and therefore cell
  * assignment, probe choice and ranking — match bitwise across engines.
  * Ties break on centroid id in both engines (stated rule; bitwise
  * cosine ties between distinct centroids do not occur in practice). */
object IvfOracle {

  def sql(nlist: Int = 16, nprobe: Int = 4, k: Int = 5, qBound: Long = 8,
      iters: Int = 0, dim: Int = 64): String = {
    val refine = (1 to iters).map { i =>
      val prev = s"cent${i - 1}"
      s"""asg$i AS (
         |  SELECT n_id, c_id FROM (
         |    SELECT corp.n_id, c.c_id, row_number() OVER (PARTITION BY corp.n_id
         |      ORDER BY list_cosine_similarity(corp.v, c.cv) DESC, c.c_id ASC) rk
         |    FROM corp, $prev c) t WHERE rk = 1),
         |el$i AS (
         |  SELECT a.c_id, t.i AS pos, c2.v[t.i] AS x
         |  FROM asg$i a, corp c2, range(1, ${dim + 1}) t(i)
         |  WHERE c2.n_id = a.n_id),
         |sum$i AS (
         |  SELECT c_id, pos, sum(CAST(floor(x * 1048576.0) AS BIGINT)) sq, count(*) cnt
         |  FROM el$i GROUP BY c_id, pos),
         |cent$i AS (
         |  SELECT c_id, list(CAST(sq AS DOUBLE) / (1048576.0 * CAST(cnt AS DOUBLE))
         |                    ORDER BY pos) cv
         |  FROM sum$i GROUP BY c_id),""".stripMargin
    }.mkString("\n")
    val cent = s"cent$iters"
    s"""WITH corp AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings),
       |cent0 AS (
       |  SELECT vec_id c_id, embedding::DOUBLE[] cv FROM embeddings WHERE vec_id < $nlist),
       |$refine
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM corp, $cent) t WHERE rk = 1),
       |q AS (SELECT vec_id q_id, embedding::DOUBLE[] qv FROM embeddings WHERE vec_id < $qBound),
       |probe AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY list_cosine_similarity(qv, cv) DESC, c_id ASC) rk
       |    FROM q, $cent) t WHERE rk <= $nprobe)
       |SELECT q_id, n_id, cos, rank FROM (
       |  SELECT q.q_id, corp.n_id, list_cosine_similarity(q.qv, corp.v) AS cos,
       |    CAST(row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.qv, corp.v) DESC, corp.n_id ASC) AS BIGINT) AS rank
       |  FROM q
       |  JOIN probe ON probe.q_id = q.q_id
       |  JOIN assign ON assign.c_id = probe.c_id
       |  JOIN corp ON corp.n_id = assign.n_id
       |  WHERE q.q_id <> corp.n_id) t
       |WHERE rank <= $k""".stripMargin
  }
}
