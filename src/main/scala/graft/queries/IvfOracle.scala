package graft.queries

/** Generated DuckDB mirror of [[graft.operators.Similarity.ivfTopK]]
  * (IVF-flat approximate top-k).
  *
  * Fully relational — unlike [[AnnOracle]] no literals are injected:
  * the centroids are themselves corpus rows (`vec_id < nlist`, the
  * deterministic sample q49 uses), so cell assignment, probe choice and
  * ranking are expressed as joins + windows over the same parquet. All
  * cosines are left-fold double on both engines (`graft_dot` ≡
  * `list_cosine_similarity`, bitwise), so the argmax cell of every
  * corpus vector and the nprobe cells of every query match exactly;
  * ties break on centroid id in both engines (stated rule; bitwise
  * cosine ties between distinct centroids do not occur in practice). */
object IvfOracle {

  def sql(nlist: Int = 16, nprobe: Int = 4, k: Int = 5, qBound: Long = 8): String =
    s"""WITH cent AS (
       |  SELECT vec_id c_id, embedding::DOUBLE[] cv FROM embeddings WHERE vec_id < $nlist),
       |corp AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings),
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM corp, cent) t WHERE rk = 1),
       |q AS (SELECT vec_id q_id, embedding::DOUBLE[] qv FROM embeddings WHERE vec_id < $qBound),
       |probe AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY list_cosine_similarity(qv, cv) DESC, c_id ASC) rk
       |    FROM q, cent) t WHERE rk <= $nprobe)
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
