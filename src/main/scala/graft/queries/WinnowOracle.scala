package graft.queries

import graft.operators.Winnow

/** Generated DuckDB mirror of [[graft.operators.Winnow]]: positional
  * token-3-grams (the MinhashOracle gram construction, with position
  * kept instead of distinct'd), the 36-bit md5 base, the
  * `h36·2²⁴ + (2²⁴−1−i)` encoding whose window `min` IS
  * "min hash, rightmost tie", full windows only, distinct per-doc
  * fingerprints, df-capped cross-doc match counts. */
object WinnowOracle {

  private def b48(hexOf: String): String =
    (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5($hexOf), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")

  /** Shared CTE chain ending in `fp(doc_id, fp_h)` (distinct). */
  private def fpChain(window: Int): String =
    s"""docs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks
       |  FROM documents WHERE doc_id IS NOT NULL),
       |g AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
       |        (${b48("concat(toks[CAST(i AS INTEGER)], ' ', toks[CAST(i AS INTEGER)+1], ' ', toks[CAST(i AS INTEGER)+2])")}) % ${Winnow.H36} AS h36
       |      FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks)-1, 1))) AS i FROM docs)),
       |e AS (SELECT doc_id, i,
       |        h36 * ${Winnow.PosPack} + (${Winnow.PosPack - 1} - i) AS enc FROM g),
       |s AS (SELECT doc_id, i,
       |        min(enc) OVER (PARTITION BY doc_id ORDER BY i
       |          ROWS BETWEEN CURRENT ROW AND ${window - 1} FOLLOWING) AS sel,
       |        count(*) OVER (PARTITION BY doc_id) AS n
       |      FROM e),
       |fp AS (SELECT DISTINCT doc_id, sel // ${Winnow.PosPack} AS fp_h
       |       FROM s WHERE i <= n - ${window - 1})""".stripMargin

  /** q120: (a_id, b_id, n_shared) at ≥ minShared shared df-capped
    * fingerprint hashes. */
  def matchesSql(window: Int = 4, minShared: Long = 2L, maxDf: Long = 20L): String =
    s"""WITH ${fpChain(window)},
       |rare AS (SELECT fp_h FROM fp GROUP BY fp_h HAVING count(*) <= $maxDf),
       |capped AS (SELECT f.doc_id, f.fp_h FROM fp f JOIN rare USING (fp_h))
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM capped a JOIN capped b ON a.fp_h = b.fp_h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING count(*) >= $minShared""".stripMargin
}
