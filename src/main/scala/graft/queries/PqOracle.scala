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

  /** The train chain over a source CTE `$src` carrying (vec_id, nv):
    * long-form subvectors → seed codebooks (`vec_id < ksub`) →
    * `iters` unrolled Lloyd rounds, ending at CTE `cb{iters}`
    * (s, code, cv). Shared by the normalized-vector family and the
    * residual family (q133). */
  private def trainCtes(src: String, m: Int, ksub: Int, iters: Int, dim: Int): String = {
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
    s"""sub AS (
       |  SELECT vec_id, t.s, nv[t.s * $ds + 1 : (t.s + 1) * $ds] sv
       |  FROM $src, range(0, $m) t(s)),
       |cb0 AS (SELECT s, CAST(vec_id AS INT) code, sv cv FROM sub WHERE vec_id < $ksub),
       |$rounds""".stripMargin
  }

  /** The normalized-corpus CTEs every family shares: `raw` (validity
    * filter: non-null, right length, positive norm) and `corp`
    * (vec_id, nv on the unit sphere). */
  private val corpCtes: Int => String = dim =>
    s"""raw AS (
       |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim
       |    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
       |corp AS (
       |  SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) nv
       |  FROM raw)""".stripMargin

  /** Shared CTE prefix: normalize → long-form subvectors → seed
    * codebooks → `iters` unrolled Lloyd rounds, ending at CTE
    * `cb{iters}` (s, code, cv). Caller appends the closing SELECT. */
  private def prefix(m: Int, ksub: Int, iters: Int, dim: Int): String =
    s"""WITH ${corpCtes(dim)},
       |${trainCtes("corp", m, ksub, iters, dim)}""".stripMargin

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

  /** q139 mirror of [[graft.operators.Similarity.sqAudit]] (SQ8):
    * normalized corpus → long-form (vec, pos, x) → per-dimension
    * [min, max] stats → 8-bit code / reconstruction / quantized
    * squared error per element → per-vector BIGINT sum + max. Every
    * expression is the identical IEEE chain the Spark side evaluates;
    * the only corpus-order-dependent sum accumulates floor(·2^20)
    * BIGINTs. */
  def sqAuditSql(dim: Int = 64): String =
    s"""WITH ${corpCtes(dim)},
       |rows0 AS MATERIALIZED (
       |  SELECT vec_id, t.i AS pos, nv[t.i] AS x
       |  FROM corp, range(1, ${dim + 1}) t(i)),
       |st AS (SELECT pos, min(x) mn, max(x) mx FROM rows0 GROUP BY pos),
       |enc AS (
       |  SELECT r.vec_id,
       |    CAST(floor((r.x - (s.mn + (CASE WHEN s.mx > s.mn
       |        THEN least(greatest(floor((r.x - s.mn) * 255.0 / (s.mx - s.mn)), 0.0), 255.0)
       |        ELSE 0.0 END) * (s.mx - s.mn) / 255.0))
       |      * (r.x - (s.mn + (CASE WHEN s.mx > s.mn
       |        THEN least(greatest(floor((r.x - s.mn) * 255.0 / (s.mx - s.mn)), 0.0), 255.0)
       |        ELSE 0.0 END) * (s.mx - s.mn) / 255.0))
       |      * 1048576.0) AS BIGINT) AS eq
       |  FROM rows0 r JOIN st s USING (pos))
       |SELECT vec_id, CAST(sum(eq) AS BIGINT) AS dist_q,
       |  CAST(max(eq) AS BIGINT) AS max_err_q
       |FROM enc GROUP BY vec_id""".stripMargin

  /** Query-lut CTEs (normalized query subvectors + the m×ksub integer
    * distance table per query), appended after [[codesCtes]]; ends at
    * CTE `lut` (q_id, s, code, dq). Shared by the flat-ADC and IVFADC
    * closings. */
  private def lutCtes(m: Int, iters: Int, dim: Int, qBound: Long): String = {
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
       |  GROUP BY 1, 2, 3)""".stripMargin
  }

  /** ADC CTE chain (query luts + per-(q, n) integer sums), appended
    * after [[codesCtes]]; ends at CTE `adc` (q_id, n_id, adc_q). */
  private def adcCtes(m: Int, iters: Int, dim: Int, qBound: Long): String =
    s"""${lutCtes(m, iters, dim, qBound)},
       |adc AS (
       |  SELECT l.q_id, c.vec_id n_id, sum(l.dq) adc_q
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
       |  WHERE l.q_id <> c.vec_id
       |  GROUP BY 1, 2)""".stripMargin

  /** IVF cell CTEs over the `raw` frame (seed centroids = corpus rows
    * `vec_id < nlist`, the q49 convention): `probe` (q_id, c_id — the
    * query's nprobe highest-cosine cells) and `assign` (n_id, c_id —
    * every vector's argmax cell). Cosine is scale-invariant, so raw
    * vs normalized vectors assign identically; `raw` is used because
    * it already carries the family's validity filter. */
  private def ivfCtes(nlist: Int, nprobe: Int, qBound: Long): String =
    s"""cent AS (SELECT vec_id c_id, v cv FROM raw WHERE vec_id < $nlist),
       |probe AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT r.vec_id q_id, c.c_id, row_number() OVER (PARTITION BY r.vec_id
       |      ORDER BY list_cosine_similarity(r.v, c.cv) DESC, c.c_id ASC) rk
       |    FROM raw r, cent c WHERE r.vec_id < $qBound) t WHERE rk <= $nprobe),
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT r.vec_id n_id, c.c_id, row_number() OVER (PARTITION BY r.vec_id
       |      ORDER BY list_cosine_similarity(r.v, c.cv) DESC, c.c_id ASC) rk
       |    FROM raw r, cent c) t WHERE rk = 1),
       |iadc AS (
       |  SELECT l.q_id, c.vec_id n_id, sum(l.dq) adc_q
       |  FROM codes c
       |  JOIN assign a ON a.n_id = c.vec_id
       |  JOIN probe p ON p.c_id = a.c_id
       |  JOIN lut l ON l.q_id = p.q_id AND l.s = c.s AND l.code = c.code
       |  WHERE l.q_id <> c.vec_id
       |  GROUP BY 1, 2)""".stripMargin

  /** q132: IVFADC top-k — probe nprobe cells, ADC-rank only the probed
    * cells' codes; (q_id, n_id, adc_q, rank). */
  def ivfAdcTopKSql(m: Int = 4, ksub: Int = 8, iters: Int = 2, k: Int = 5,
      qBound: Long = 8, dim: Int = 64, nlist: Int = 16, nprobe: Int = 4): String =
    s"""${prefix(m, ksub, iters, dim)}
       |${codesCtes(m, iters, dim)},
       |${lutCtes(m, iters, dim, qBound)},
       |${ivfCtes(nlist, nprobe, qBound)}
       |SELECT q_id, n_id, CAST(adc_q AS BIGINT) AS adc_q, rank FROM (
       |  SELECT q_id, n_id, adc_q,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc_q ASC, n_id ASC) AS BIGINT) AS rank
       |  FROM iadc) t
       |WHERE rank <= $k""".stripMargin

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

  /** q133: the residual-PQ code sheet (mirror of
    * [[graft.operators.Similarity.pqResidualCodes]]) — normalize, IVF
    * cell assignment (seed centroids `vec_id < nlist`), residual
    * `nv − ĉ(cell)` with the centroid itself normalized, then the SAME
    * train+encode chain as q129 FROM the residual frame. The residual
    * components are two correctly-rounded divisions and a subtraction
    * per element — IEEE-identical across engines — so the whole sheet
    * oracles bitwise. */
  def residCodesSql(m: Int = 4, ksub: Int = 8, iters: Int = 2, dim: Int = 64,
      nlist: Int = 16): String =
    s"""WITH ${corpCtes(dim)},
       |rcent AS (
       |  SELECT vec_id c_id,
       |    list_transform(v, x -> x / sqrt(list_dot_product(v, v))) cnv,
       |    v cv
       |  FROM raw WHERE vec_id < $nlist),
       |rassign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT r.vec_id n_id, c.c_id, row_number() OVER (PARTITION BY r.vec_id
       |      ORDER BY list_cosine_similarity(r.v, c.cv) DESC, c.c_id ASC) rk
       |    FROM raw r, rcent c) t WHERE rk = 1),
       |rcorp AS (
       |  SELECT corp.vec_id,
       |    list_transform(list_zip(corp.nv, cn.cnv), x -> x[1] - x[2]) nv
       |  FROM corp JOIN rassign a ON a.n_id = corp.vec_id
       |  JOIN rcent cn ON cn.c_id = a.c_id),
       |${trainCtes("rcorp", m, ksub, iters, dim)}
       |${codesCtes(m, iters, dim)}
       |SELECT vec_id, CAST(s AS INT) AS s, CAST(code AS INT) AS code,
       |  CAST(dq AS BIGINT) AS dist_q
       |FROM codes""".stripMargin

  /** q142: IVFADC+R — the [[ivfAdcTopKSql]] chain kept to a SHORTLIST
    * of `shortlist` ADC candidates per query, re-ranked by exact
    * cosine over the shortlisted raw vectors only (mirror of
    * [[graft.operators.Similarity.ivfAdcRerankTopK]]).
    * `list_cosine_similarity` is the same IEEE chain the engine's
    * codegen'd dot/(‖q‖·‖n‖) evaluates — the q30 bitwise precedent. */
  def ivfAdcRerankSql(m: Int = 4, ksub: Int = 8, iters: Int = 2, k: Int = 5,
      shortlist: Int = 15, qBound: Long = 8, dim: Int = 64, nlist: Int = 16,
      nprobe: Int = 4): String =
    s"""${prefix(m, ksub, iters, dim)}
       |${codesCtes(m, iters, dim)},
       |${lutCtes(m, iters, dim, qBound)},
       |${ivfCtes(nlist, nprobe, qBound)},
       |short AS (
       |  SELECT q_id, n_id, adc_q FROM (
       |    SELECT q_id, n_id, adc_q,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY adc_q ASC, n_id ASC) rk
       |    FROM iadc) t WHERE rk <= $shortlist)
       |SELECT q_id, n_id, CAST(adc_q AS BIGINT) AS adc_q, cos, rank FROM (
       |  SELECT s.q_id, s.n_id, s.adc_q,
       |    list_cosine_similarity(qr.v, nr.v) AS cos,
       |    CAST(row_number() OVER (PARTITION BY s.q_id
       |      ORDER BY list_cosine_similarity(qr.v, nr.v) DESC, s.n_id ASC)
       |      AS BIGINT) AS rank
       |  FROM short s
       |  JOIN raw qr ON qr.vec_id = s.q_id
       |  JOIN raw nr ON nr.vec_id = s.n_id) t
       |WHERE rank <= $k""".stripMargin

  /** q131: the recall audit — per query, a `method` = 'pq' row (flat
    * ADC, the compression ceiling) AND a `method` = 'ivfadc' row (the
    * deployed IVF∘PQ composition at nprobe), both against the same
    * exact cosine arm (the q117 sheet shape, so lsh / ivf / pq /
    * ivfadc all audit against the same exact top-k). */
  def recallSql(m: Int = 4, ksub: Int = 8, iters: Int = 2, k: Int = 5,
      qBound: Long = 8, dim: Int = 64, nlist: Int = 16, nprobe: Int = 4): String =
    s"""WITH exact AS (SELECT q_id, n_id FROM (
       |${AnnRecallOracle.bruteForceSql(qBound, k)}
       |)),
       |pqf AS (SELECT q_id, n_id FROM (
       |${adcTopKSql(m, ksub, iters, k, qBound, dim)}
       |)),
       |iv AS (SELECT q_id, n_id FROM (
       |${ivfAdcTopKSql(m, ksub, iters, k, qBound, dim, nlist, nprobe)}
       |)),
       |u AS (SELECT q_id, 'pq' AS method, n_id FROM pqf
       |      UNION ALL SELECT q_id, 'ivfadc', n_id FROM iv)
       |SELECT u.q_id, u.method,
       |  CAST(count(*) AS BIGINT) AS n_returned,
       |  CAST(coalesce(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
       |  CAST(coalesce(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS DOUBLE) / $k AS recall
       |FROM u LEFT JOIN exact e ON e.q_id = u.q_id AND e.n_id = u.n_id
       |GROUP BY u.q_id, u.method""".stripMargin
}
