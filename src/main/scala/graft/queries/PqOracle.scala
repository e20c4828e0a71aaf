package graft.queries

/** Generated DuckDB mirror of the product-quantization family
  * ([[graft.operators.Similarity.pqTrain]] / `pqEncode` / `pqAdcTopK`
  * / `pqRecallAudit`).
  *
  * Fully relational like [[IvfOracle]]: seeds are corpus rows
  * (`vec_id < ksub`, code = vec_id), every Lloyd round unrolls as the
  * same assign → quantized-mean CTE chain the Spark side executes, and
  * — because every DISTANCE is exact integer arithmetic (components
  * floor(·2^14) to BIGINT before the squared-difference sum) — the
  * argmins, ADC sums and rankings carry no float fold-order dependence
  * at all. The only floating values anywhere are the normalized
  * components x/‖v‖ (one correctly-rounded sqrt + division per
  * component, bitwise identical: `list_dot_product` ≡ `graft_dot`)
  * and the codebook means sq/(2^20·cnt) (exact-integer numerator, one
  * correctly-rounded division — the kmeansIterate contract). */
object PqOracle {

  /** Shared CTE prefix: normalize → long-form subvectors → seed
    * codebooks → `iters` unrolled Lloyd rounds, ending at CTE
    * `cb{iters}` (s, code, cv). Caller appends the closing SELECT. */
  private def prefix(m: Int, ksub: Int, iters: Int, dim: Int): String = {
    val ds = dim / m
    def q14(e: String) = s"CAST(floor($e * 16384.0) AS BIGINT)"
    val rounds = (1 to iters).map { i =>
      val prev = s"cb${i - 1}"
      s"""d$i AS (
         |  SELECT sub.vec_id, sub.s, c.code,
         |    sum((${q14(s"sub.sv[t.i]")} - ${q14(s"c.cv[t.i]")})
         |      * (${q14(s"sub.sv[t.i]")} - ${q14(s"c.cv[t.i]")})) dq
         |  FROM sub JOIN $prev c ON c.s = sub.s, range(1, ${ds + 1}) t(i)
         |  GROUP BY 1, 2, 3),
         |a$i AS (
         |  SELECT vec_id, s, code FROM (
         |    SELECT vec_id, s, code,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dq ASC, code ASC) rk
         |    FROM d$i) t WHERE rk = 1),
         |el$i AS (
         |  SELECT a.s, a.code, t.i AS pos, sub.sv[t.i] AS x
         |  FROM a$i a JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s,
         |    range(1, ${ds + 1}) t(i)),
         |sm$i AS (
         |  SELECT s, code, pos, sum(CAST(floor(x * 1048576.0) AS BIGINT)) sq, count(*) cnt
         |  FROM el$i GROUP BY 1, 2, 3),
         |cb$i AS (
         |  SELECT s, code, list(CAST(sq AS DOUBLE) / (1048576.0 * CAST(cnt AS DOUBLE))
         |                       ORDER BY pos) cv
         |  FROM sm$i GROUP BY s, code),""".stripMargin
    }.mkString("\n")
    s"""WITH raw AS (
       |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim
       |    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
       |corp AS (
       |  SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) nv
       |  FROM raw),
       |sub AS (
       |  SELECT vec_id, t.s, nv[t.s * $ds + 1 : (t.s + 1) * $ds] sv
       |  FROM corp, range(0, $m) t(s)),
       |cb0 AS (SELECT s, CAST(vec_id AS INT) code, sv cv FROM sub WHERE vec_id < $ksub),
       |$rounds""".stripMargin
  }

  /** Final-codebook assignment CTEs (`df` distances, `codes` argmin),
    * appended after [[prefix]] — the q129 surface and the ADC chain's
    * index side. */
  private def codesCtes(m: Int, iters: Int, dim: Int): String = {
    val ds = dim / m
    def q14(e: String) = s"CAST(floor($e * 16384.0) AS BIGINT)"
    s"""df AS (
       |  SELECT sub.vec_id, sub.s, c.code,
       |    sum((${q14(s"sub.sv[t.i]")} - ${q14(s"c.cv[t.i]")})
       |      * (${q14(s"sub.sv[t.i]")} - ${q14(s"c.cv[t.i]")})) dq
       |  FROM sub JOIN cb$iters c ON c.s = sub.s, range(1, ${ds + 1}) t(i)
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, s, code, dq FROM (
       |    SELECT vec_id, s, code, dq,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dq ASC, code ASC) rk
       |    FROM df) t WHERE rk = 1)""".stripMargin
  }

  /** q129: the PQ code sheet — (vec_id, s, code, dist_q) at the
    * trained codebooks. */
  def codesSql(m: Int = 4, ksub: Int = 8, iters: Int = 2, dim: Int = 64): String =
    s"""${prefix(m, ksub, iters, dim)}
       |${codesCtes(m, iters, dim)}
       |SELECT vec_id, CAST(s AS INT) AS s, CAST(code AS INT) AS code,
       |  CAST(dq AS BIGINT) AS dist_q
       |FROM codes""".stripMargin

  /** ADC CTE chain (query luts + per-(q, n) integer sums), appended
    * after [[codesCtes]]; ends at CTE `adc` (q_id, n_id, adc_q). */
  private def adcCtes(m: Int, iters: Int, dim: Int, qBound: Long): String = {
    val ds = dim / m
    def q14(e: String) = s"CAST(floor($e * 16384.0) AS BIGINT)"
    s"""qsub AS (
       |  SELECT vec_id q_id, t.s, nv[t.s * $ds + 1 : (t.s + 1) * $ds] sv
       |  FROM corp, range(0, $m) t(s) WHERE vec_id < $qBound),
       |lut AS (
       |  SELECT qsub.q_id, qsub.s, c.code,
       |    sum((${q14(s"qsub.sv[t.i]")} - ${q14(s"c.cv[t.i]")})
       |      * (${q14(s"qsub.sv[t.i]")} - ${q14(s"c.cv[t.i]")})) dq
       |  FROM qsub JOIN cb$iters c ON c.s = qsub.s, range(1, ${ds + 1}) t(i)
       |  GROUP BY 1, 2, 3),
       |adc AS (
       |  SELECT l.q_id, c.vec_id n_id, sum(l.dq) adc_q
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
       |  WHERE l.q_id <> c.vec_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** q130: ADC top-k — (q_id, n_id, adc_q, rank), ascending quantized
    * distance, ties → lower n_id. */
  def adcTopKSql(m: Int = 4, ksub: Int = 8, iters: Int = 2, k: Int = 5,
      qBound: Long = 8, dim: Int = 64): String =
    s"""${prefix(m, ksub, iters, dim)}
       |${codesCtes(m, iters, dim)},
       |${adcCtes(m, iters, dim, qBound)}
       |SELECT q_id, n_id, CAST(adc_q AS BIGINT) AS adc_q, rank FROM (
       |  SELECT q_id, n_id, adc_q,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc_q ASC, n_id ASC) AS BIGINT) AS rank
       |  FROM adc) t
       |WHERE rank <= $k""".stripMargin

  /** q131: the recall audit — (q_id, method='pq', n_returned, n_hits,
    * recall) against the exact cosine arm (the q117 sheet shape, so
    * lsh / ivf / pq all audit against the same exact top-k). */
  def recallSql(m: Int = 4, ksub: Int = 8, iters: Int = 2, k: Int = 5,
      qBound: Long = 8, dim: Int = 64): String =
    s"""WITH exact AS (SELECT q_id, n_id FROM (
       |${AnnRecallOracle.bruteForceSql(qBound, k)}
       |)),
       |pq AS (SELECT q_id, n_id FROM (
       |${adcTopKSql(m, ksub, iters, k, qBound, dim)}
       |))
       |SELECT p.q_id, 'pq' AS method,
       |  CAST(count(*) AS BIGINT) AS n_returned,
       |  CAST(coalesce(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
       |  CAST(coalesce(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS DOUBLE) / $k AS recall
       |FROM pq p LEFT JOIN exact e ON e.q_id = p.q_id AND e.n_id = p.n_id
       |GROUP BY p.q_id""".stripMargin
}
