package graft.queries

/** Generated DuckDB mirror of
  * [[graft.operators.Mixing.dsirWeights]] — hashed-bigram DSIR
  * importance weights with the exact fixed-point log2
  * ([[graft.operators.Mixing.log2qExpr]]) replayed as six unrolled CTE
  * steps over the bucket sheet: per tracked value, normalize to a
  * 2^20-scaled mantissa, then six square/truncate/shift-out-a-bit
  * rounds — every step a BIGINT multiply/divide with a defined
  * truncation, bit-identical to the Spark fold. */
object DsirOracle {

  /** 48-bit md5 prefix of a hex column, digit by digit (the
    * MinhashOracle idiom). */
  private def md5b48(hexCol: String): String =
    (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr($hexCol, ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")

  /** Six fixed-point log2 rounds over the named `vars`, whose inputs
    * are columns `x_<v>` of CTE `{prefix}0`'s FROM source; emits CTEs
    * {prefix}0..{prefix}6 carrying (keyCols, e_v, m_v, f_v per v).
    * Shared with [[Bm25Oracle]] (different key columns / prefixes) so
    * the two families cannot drift from the one textual definition of
    * the log2q replay. */
  private[queries] def logChain(src: String, vars: Seq[(String, String)],
      keyCols: Seq[String] = Seq("b"), prefix: String = "l"): String = {
    val keys = if (keyCols.isEmpty) "" else keyCols.mkString(", ") + ","
    // mantissa init mirrors Mixing.log2qExpr's full-BIGINT-domain form:
    // shift x itself up/down to [2^20, 2^21) instead of forming the
    // x*2^20 product (identical value wherever both are defined)
    val init = vars.map { case (v, x) =>
      s"""length(bin($x)) - 1 AS e_$v,
         |    CASE WHEN length(bin($x)) > 21
         |      THEN ($x) // (CAST(1 AS BIGINT) << (length(bin($x)) - 21))
         |      ELSE ($x) * (CAST(1 AS BIGINT) << (21 - length(bin($x))))
         |    END AS m_$v,
         |    CAST(0 AS BIGINT) AS f_$v""".stripMargin
    }.mkString(",\n    ")
    val steps = (1 to 6).map { i =>
      val cols = vars.map { case (v, _) =>
        s"""CASE WHEN (m_$v * m_$v) // 1048576 >= 2097152
           |      THEN ((m_$v * m_$v) // 1048576) // 2
           |      ELSE (m_$v * m_$v) // 1048576 END AS m_$v,
           |    f_$v * 2 + CASE WHEN (m_$v * m_$v) // 1048576 >= 2097152
           |      THEN 1 ELSE 0 END AS f_$v, e_$v""".stripMargin
      }.mkString(",\n    ")
      s"$prefix$i AS (SELECT $keys\n    $cols\n  FROM $prefix${i - 1})"
    }.mkString(",\n")
    s"""${prefix}0 AS (SELECT $keys
       |    $init
       |  FROM $src),
       |$steps""".stripMargin
  }

  /** q126 mirror. */
  def sql(targetPermille: Int = 100, buckets: Int = 8192,
      salt: String = "graft"): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt)
    s"""WITH toks AS MATERIALIZED (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |        FROM documents WHERE text IS NOT NULL),
       |mem AS (SELECT doc_id, (($bucket) % 1000 < $targetPermille) AS is_t
       |        FROM documents WHERE doc_id IS NOT NULL),
       |bg0 AS (SELECT doc_id,
       |          md5(t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1]) AS h
       |        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
       |              FROM toks WHERE len(t) >= 2)),
       |bg AS (SELECT doc_id, (${md5b48("h")}) % $buckets AS b FROM bg0),
       |hb AS MATERIALIZED (SELECT bg.doc_id, mem.is_t, bg.b,
       |          CAST(count(*) AS BIGINT) AS occ
       |        FROM bg JOIN mem USING (doc_id) GROUP BY 1, 2, 3),
       |sheet AS (SELECT b,
       |    CAST(sum(CASE WHEN is_t THEN occ ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(sum(occ) AS BIGINT) AS cr
       |  FROM hb GROUP BY b),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tct,
       |               CAST(sum(cr) AS BIGINT) AS tcr FROM sheet),
       |${logChain("sheet, tot", Seq(
           "a" -> "ct + 1", "c" -> "cr + 1", "d" -> "tcr + 1", "g" -> "tct + 1"))},
       |lr AS (SELECT b, (e_a * 64 + f_a) - (e_c * 64 + f_c)
       |              + (e_d * 64 + f_d) - (e_g * 64 + f_g) AS lr_q FROM l6),
       |per AS (SELECT hb.doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
       |          CAST(sum(occ * lr_q) AS BIGINT) AS weight_q
       |        FROM hb JOIN lr USING (b) GROUP BY hb.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  CAST(coalesce(per.weight_q, 0) AS BIGINT) AS weight_q
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin
  }

  /** q155 mirror: the per-source add-1-smoothed KL fingerprint over
    * the hashed-bigram buckets
    * ([[graft.operators.Mixing.sourceKlDivergence]]) — the q126
    * bigram/hash CTEs keyed by source instead of doc, a sources ×
    * buckets grid (zero cells included), the shared [[logChain]]
    * replay on its four operands, and a trunc-toward-zero closing
    * division through the same explicit sign CASE the Spark side
    * computes. */
  def sourceKlSql(buckets: Int = 8192): String = {
    s"""WITH toks AS MATERIALIZED (SELECT coalesce(source, 'unknown') AS source,
       |        string_split_regex(lower(text), '\\s+') AS t
       |      FROM documents WHERE text IS NOT NULL),
       |bg0 AS (SELECT source, md5(t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1]) AS h
       |        FROM (SELECT source, t, unnest(range(1, len(t))) AS i
       |              FROM toks WHERE len(t) >= 2)),
       |sb AS MATERIALIZED (SELECT source, (${md5b48("h")}) % $buckets AS b,
       |          CAST(count(*) AS BIGINT) AS c_sb
       |        FROM bg0 GROUP BY 1, 2),
       |gb AS (SELECT b, CAST(sum(c_sb) AS BIGINT) AS c_gb FROM sb GROUP BY b),
       |tsrc AS (SELECT source, CAST(sum(c_sb) AS BIGINT) AS t_s FROM sb GROUP BY source),
       |tots AS (SELECT CAST(coalesce(sum(c_sb), 0) AS BIGINT) AS t_g FROM sb),
       |srcs AS (SELECT DISTINCT coalesce(source, 'unknown') AS source FROM documents),
       |grid AS (SELECT s.source, gg.b,
       |      CAST(coalesce(sb.c_sb, 0) AS BIGINT) AS c_sb,
       |      CAST(coalesce(gb.c_gb, 0) AS BIGINT) AS c_gb,
       |      CAST(coalesce(tsrc.t_s, 0) AS BIGINT) AS t_s, tots.t_g
       |   FROM srcs s
       |   CROSS JOIN (SELECT unnest(range(0, $buckets)) AS b) gg
       |   LEFT JOIN sb ON sb.source = s.source AND sb.b = gg.b
       |   LEFT JOIN gb ON gb.b = gg.b
       |   LEFT JOIN tsrc ON tsrc.source = s.source, tots),
       |${logChain("grid", Seq(
           "a" -> "c_sb + 1", "c" -> s"t_s + $buckets",
           "d" -> "c_gb + 1", "g" -> s"t_g + $buckets"),
         keyCols = Seq("source", "c_sb", "t_s"))},
       |lr AS (SELECT source, c_sb, t_s,
       |    (e_a * 64 + f_a) - (e_c * 64 + f_c) - (e_d * 64 + f_d) + (e_g * 64 + f_g) AS dq
       |  FROM l6),
       |agg AS (SELECT source,
       |    CAST(max(t_s) AS BIGINT) AS n_bigrams,
       |    CAST(sum(CASE WHEN c_sb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets,
       |    CAST(sum((c_sb + 1) * dq) AS BIGINT) AS num
       |  FROM lr GROUP BY source)
       |SELECT source, n_bigrams, n_buckets,
       |  CAST(CASE WHEN num >= 0 THEN num // (n_bigrams + $buckets)
       |       ELSE -((-num) // (n_bigrams + $buckets)) END AS BIGINT) AS kl_q
       |FROM agg""".stripMargin
  }

  /** q161 mirror: the DSIR importance resample
    * ([[graft.operators.Mixing.dsirResample]]) — the q126 weight
    * chain embedded verbatim, the q55 md5 bucket under the SAMPLE
    * salt, the base-2 Gumbel key through two more [[logChain]]
    * replays (eq = log2q(1001) − log2q(bucket+1), then
    * key_q = weight_q + 384 − log2q(eq+1)), and the budget cut as
    * percentile_disc at (1000−budget)/1000 (≡ multiQuantileDisc, the
    * q60 pin) with the STRICT > keep predicate. */
  def resampleSql(budgetPermille: Int, targetPermille: Int = 100,
      buckets: Int = 8192, salt: String = "graft",
      sampleSalt: String = "resample"): String = {
    require(budgetPermille >= 0 && budgetPermille <= 1000)
    val closing =
      if (budgetPermille == 1000)
        "SELECT doc_id, source, n_bigrams, weight_q, key_q FROM scored"
      else {
        val q = (BigDecimal(1000 - budgetPermille) / BigDecimal(1000))
          .underlying.stripTrailingZeros.toPlainString
        s""",
           |cut AS (SELECT percentile_disc($q) WITHIN GROUP (ORDER BY key_q) AS c
           |  FROM scored)
           |SELECT doc_id, source, n_bigrams, weight_q, key_q
           |FROM scored, cut WHERE key_q > c""".stripMargin
      }
    s"""WITH ${scoredCtes(targetPermille, buckets, salt, sampleSalt)}
       |$closing""".stripMargin
  }

  /** q168 mirror: the shared Gumbel-scored chain; nine exact
    * percentile_disc cuts, one per budget decile (≡ [[graft.operators
    * .Quantiles.globalQuantileDisc]]'s multi-target locate, the q60
    * pin); per-budget keeps under the STRICT q161 rule; BIGINT
    * rollups with the corpus totals repeated per row. Budget rows
    * come from a VALUES list so they never vanish — an empty corpus
    * yields nine all-zero rows with NULL cuts, exactly the engine's
    * universe-left-join shape. */
  def budgetSweepSql(targetPermille: Int = 100, buckets: Int = 8192,
      salt: String = "graft", sampleSalt: String = "resample"): String = {
    val vals = (100 to 900 by 100).map { b =>
      val q = (BigDecimal(1000 - b) / BigDecimal(1000))
        .underlying.stripTrailingZeros.toPlainString
      s"($b, (SELECT percentile_disc($q) WITHIN GROUP (ORDER BY key_q) FROM scored))"
    }.mkString(",\n  ")
    s"""WITH ${scoredCtes(targetPermille, buckets, salt, sampleSalt)},
       |cutv(budget_permille, cut_q) AS (VALUES
       |  $vals),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_total,
       |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens_total
       |  FROM scored),
       |k AS (SELECT cv.budget_permille,
       |    CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(s.n_tokens) AS BIGINT) AS nt,
       |    CAST(sum(s.weight_q) AS BIGINT) AS wq
       |  FROM cutv cv JOIN scored s ON s.key_q > cv.cut_q
       |  GROUP BY cv.budget_permille)
       |SELECT CAST(cv.budget_permille AS BIGINT) AS budget_permille,
       |  cv.cut_q,
       |  coalesce(k.nd, 0) AS n_docs_kept,
       |  coalesce(k.nt, 0) AS n_tokens_kept,
       |  coalesce(k.wq, 0) AS weight_q_kept,
       |  t.n_docs_total, t.n_tokens_total
       |FROM cutv cv LEFT JOIN k USING (budget_permille) CROSS JOIN tot t""".stripMargin
  }

  /** q165 mirror: the shared Gumbel-scored chain closed by the
    * token-budget prefix ([[graft.operators.Mixing
    * .dsirResampleTokens]]) — the ROWS-framed cumulative token sum
    * over the total (key_q DESC, doc_id) order (ROWS, not DuckDB's
    * default RANGE: Spark's rowsBetween is ROWS) against the
    * whole-frame total, kept by the exact integer
    * cross-multiplication. */
  def resampleTokensSql(tokenBudgetPermille: Int, targetPermille: Int = 100,
      buckets: Int = 8192, salt: String = "graft",
      sampleSalt: String = "resample"): String = {
    require(tokenBudgetPermille >= 0 && tokenBudgetPermille <= 1000)
    s"""WITH ${scoredCtes(targetPermille, buckets, salt, sampleSalt)},
       |ranked AS (SELECT doc_id, source, n_tokens, weight_q, key_q,
       |    CAST(sum(n_tokens) OVER () AS BIGINT) AS tot,
       |    CAST(sum(n_tokens) OVER (ORDER BY key_q DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM scored)
       |SELECT doc_id, source, n_tokens, weight_q, key_q
       |FROM ranked WHERE cum * 1000 <= tot * $tokenBudgetPermille""".stripMargin
  }

  /** The shared q161/q165 scored chain: the q126 weight CTEs embedded
    * verbatim, the q55 md5 bucket under the SAMPLE salt, the
    * q144-convention token count, and the base-2 Gumbel key through
    * two [[logChain]] replays — ends at CTE `scored`
    * `(doc_id, source, n_tokens, n_bigrams, weight_q, key_q)`. */
  private def scoredCtes(targetPermille: Int, buckets: Int, salt: String,
      sampleSalt: String): String = {
    val bucket = DecontaminateOracle.bucketExpr(sampleSalt, "doc_id")
    val keys = Seq("doc_id", "source", "n_tokens", "n_bigrams", "weight_q")
    s"""w AS MATERIALIZED (SELECT * FROM (
       |${sql(targetPermille, buckets, salt)}
       |) t0),
       |bk AS (SELECT doc_id, coalesce(source, 'unknown') AS source,
       |    CAST(len(string_split_regex(coalesce(text, ''), '\\s+')) AS BIGINT)
       |      AS n_tokens,
       |    ($bucket) % 1000 AS bkt
       |  FROM documents WHERE doc_id IS NOT NULL),
       |j AS (SELECT bk.doc_id, bk.source, bk.n_tokens, w.n_bigrams,
       |    w.weight_q, bk.bkt
       |  FROM bk JOIN w USING (doc_id)),
       |${logChain("j", Seq("u" -> "bkt + 1", "k" -> "1001"),
         keyCols = keys, prefix = "r")},
       |eqf AS (SELECT ${keys.mkString(", ")},
       |    (e_k * 64 + f_k) - (e_u * 64 + f_u) AS eq FROM r6),
       |${logChain("eqf", Seq("g" -> "eq + 1"),
         keyCols = keys, prefix = "s")},
       |scored AS (SELECT ${keys.mkString(", ")},
       |    CAST(weight_q + 384 - (e_g * 64 + f_g) AS BIGINT) AS key_q FROM s6)""".stripMargin
  }

  /** q163 mirror: the per-source composition of the q161 keep-set —
    * the [[resampleSql]] chain embedded verbatim, rolled onto source
    * keys beside the raw per-source counts, with the exact two-step
    * fixed-point keep rate (the q154 rate idiom). */
  def resampleCompositionSql(budgetPermille: Int, targetPermille: Int = 100,
      buckets: Int = 8192, salt: String = "graft",
      sampleSalt: String = "resample"): String = {
    val rate =
      """CASE WHEN n_raw = 0 THEN 0
        |    ELSE ((n_kept * 1024) // n_raw) * 1024
        |       + (((n_kept * 1024) % n_raw) * 1024) // n_raw
        |    END""".stripMargin
    s"""WITH ks AS (SELECT * FROM (
       |${resampleSql(budgetPermille, targetPermille, buckets, salt, sampleSalt)}
       |) t9),
       |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |    CAST(sum(weight_q) AS BIGINT) AS w_kept_q
       |  FROM ks GROUP BY source),
       |raw AS (SELECT coalesce(source, 'unknown') AS source,
       |    CAST(count(*) AS BIGINT) AS n_raw
       |  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1),
       |sheet AS (SELECT raw.source, raw.n_raw,
       |    CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       |    CAST(coalesce(k.w_kept_q, 0) AS BIGINT) AS w_kept_q
       |  FROM raw LEFT JOIN k USING (source))
       |SELECT source, n_raw, n_kept, w_kept_q,
       |  CAST($rate AS BIGINT) AS kept_rate_q
       |FROM sheet""".stripMargin
  }

  /** q158 mirror: the content-KL drift monitor's batch twin
    * ([[graft.operators.Drift.contentKlDrift]]) — the q68 md5 split,
    * the q126 bigram/hash CTEs keyed by slice, the standing slice as
    * the corpus seat and the incoming slice as the source seat of the
    * q155 KL arithmetic, one closing row. */
  def contentKlSql(newPermille: Int = 100, buckets: Int = 8192,
      salt: String = "graft", alertQ: Long = 32L): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt)
    s"""WITH toks AS MATERIALIZED (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |        FROM documents WHERE text IS NOT NULL),
       |mem AS (SELECT doc_id, (($bucket) % 1000 < $newPermille) AS is_new
       |        FROM documents WHERE doc_id IS NOT NULL),
       |bg0 AS (SELECT doc_id, md5(t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1]) AS h
       |        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
       |              FROM toks WHERE len(t) >= 2)),
       |sl AS MATERIALIZED (SELECT (${md5b48("h")}) % $buckets AS b, mem.is_new
       |        FROM bg0 JOIN mem USING (doc_id)),
       |gc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_gb
       |        FROM sl WHERE NOT is_new GROUP BY b),
       |bc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_bb
       |        FROM sl WHERE is_new GROUP BY b),
       |tg AS (SELECT CAST(coalesce(sum(c_gb), 0) AS BIGINT) AS t_g FROM gc),
       |tb AS (SELECT CAST(coalesce(sum(c_bb), 0) AS BIGINT) AS t_b FROM bc),
       |grid AS (SELECT CAST(r.i AS BIGINT) AS b,
       |      CAST(coalesce(bc.c_bb, 0) AS BIGINT) AS c_bb,
       |      CAST(coalesce(gc.c_gb, 0) AS BIGINT) AS c_gb,
       |      tb.t_b, tg.t_g
       |   FROM range(0, $buckets) r(i)
       |   LEFT JOIN bc ON bc.b = r.i
       |   LEFT JOIN gc ON gc.b = r.i, tb, tg),
       |${logChain("grid", Seq(
           "a" -> "c_bb + 1", "c" -> s"t_b + $buckets",
           "d" -> "c_gb + 1", "g" -> s"t_g + $buckets"),
         keyCols = Seq("c_bb", "t_b"))},
       |lr AS (SELECT c_bb, t_b,
       |    (e_a * 64 + f_a) - (e_c * 64 + f_c) - (e_d * 64 + f_d) + (e_g * 64 + f_g) AS dq
       |  FROM l6),
       |agg AS (SELECT CAST(max(t_b) AS BIGINT) AS n_bigrams,
       |    CAST(sum(CASE WHEN c_bb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets,
       |    CAST(sum((c_bb + 1) * dq) AS BIGINT) AS num
       |  FROM lr)
       |SELECT n_bigrams, n_buckets,
       |  CAST(CASE WHEN num >= 0 THEN num // (n_bigrams + $buckets)
       |       ELSE -((-num) // (n_bigrams + $buckets)) END AS BIGINT) AS kl_q,
       |  CAST(CASE WHEN (CASE WHEN num >= 0 THEN num // (n_bigrams + $buckets)
       |       ELSE -((-num) // (n_bigrams + $buckets)) END) >= $alertQ
       |       THEN 1 ELSE 0 END AS BIGINT) AS alert
       |FROM agg""".stripMargin
  }
}
