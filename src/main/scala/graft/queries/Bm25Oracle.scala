package graft.queries

/** Generated DuckDB mirror of
  * [[graft.operators.Retrieval.bm25TopK]] — BM25 ranked retrieval with
  * every score an exact BIGINT: the Lucene idf
  * `(2N + 2)/(2df + 1)` under the fixed-point log2 kernel replayed as
  * the shared six-round CTE chain ([[DsirOracle.logChain]] — one
  * textual definition for both families), the tf saturation as the
  * integer quotient `(22·tf·avgdl·2^10) DIV (10·avgdl·tf + 3·avgdl +
  * 9·dl)` with `avgdl = T DIV N`, per-term products and per-pair sums
  * in order-independent BIGINT arithmetic. Split membership is THE
  * q55 md5-bucket; tokens the engine's lower/split idiom. */
object Bm25Oracle {

  /** q134 mirror. */
  def sql(k: Int = 5, evalPermille: Int = 50, dfCap: Long = 100L,
      salt: String = "graft"): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt)
    s"""WITH base AS (
       |  SELECT doc_id, (($bucket) % 1000 < $evalPermille) AS is_eval, text
       |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       |tok1 AS (
       |  SELECT doc_id, is_eval, t FROM (
       |    SELECT doc_id, is_eval,
       |           unnest(string_split_regex(lower(text), '\\s+')) AS t
       |    FROM base) u
       |  WHERE len(t) >= 1),
       |train AS MATERIALIZED (
       |  SELECT doc_id, t, CAST(count(*) AS BIGINT) tf
       |  FROM tok1 WHERE NOT is_eval GROUP BY 1, 2),
       |dld AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) dl FROM train GROUP BY 1),
       |st AS (SELECT CAST(count(*) AS BIGINT) n_docs,
       |              CAST(sum(dl) AS BIGINT) tot FROM dld),
       |st2 AS (SELECT n_docs, tot // n_docs AS avgdl,
       |               2 * n_docs + 2 AS x_n FROM st),
       |${DsirOracle.logChain("st2", Seq("n" -> "x_n"),
           keyCols = Seq("n_docs", "avgdl"), prefix = "kn")},
       |dfs AS (SELECT t, CAST(count(*) AS BIGINT) df FROM train
       |        GROUP BY t HAVING count(*) <= $dfCap),
       |d2 AS (SELECT t, 2 * df + 1 AS x_a FROM dfs),
       |${DsirOracle.logChain("d2", Seq("a" -> "x_a"),
           keyCols = Seq("t"), prefix = "ld")},
       |idfs AS (
       |  SELECT ld6.t,
       |    (kn6.e_n * 64 + kn6.f_n) - (ld6.e_a * 64 + ld6.f_a) AS idf_q
       |  FROM ld6, kn6),
       |postings AS (
       |  SELECT tr.t, tr.doc_id AS train_id,
       |    i.idf_q * ((22 * tr.tf * s.avgdl * 1024)
       |      // (10 * s.avgdl * tr.tf + 3 * s.avgdl + 9 * d.dl)) AS s_t
       |  FROM train tr
       |  JOIN dld d USING (doc_id)
       |  JOIN idfs i ON i.t = tr.t, kn6 s),
       |q AS (SELECT DISTINCT doc_id AS eval_id, t FROM tok1 WHERE is_eval),
       |pair AS (
       |  SELECT q.eval_id, p.train_id, CAST(sum(p.s_t) AS BIGINT) AS score_q
       |  FROM q JOIN postings p ON p.t = q.t GROUP BY 1, 2)
       |SELECT eval_id, train_id, score_q, rank FROM (
       |  SELECT eval_id, train_id, score_q,
       |    CAST(row_number() OVER (PARTITION BY eval_id
       |      ORDER BY score_q DESC, train_id ASC) AS BIGINT) AS rank
       |  FROM pair) t
       |WHERE rank <= $k""".stripMargin
  }
}
