package graft.queries

/** Generated DuckDB mirror of
  * [[graft.operators.Classifier.nbQualityScores]] — the closed-form
  * Naive Bayes quality classifier replayed relationally: the q126
  * hashed-bigram feature chain, the per-bucket +1-smoothed log-count
  * sheet (train split only), the one-row normalizer/prior constants,
  * and the held-out scoring sum — every log a
  * [[DsirOracle.logChain]] fixed-point replay, every count a BIGINT,
  * so the sheet (and the MAP decision column) oracles bitwise. */
object ClassifierOracle {

  private def md5b48(hexCol: String): String =
    (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr($hexCol, ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")

  /** q143 mirror. `positiveSql` is the label predicate over a
    * `documents` row (the engine's `positive` column). */
  def sql(positiveSql: String, trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt)
    s"""WITH toks AS MATERIALIZED (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |        FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       |mem AS (SELECT doc_id, (($bucket) % 1000 < $trainPermille) AS is_tr,
       |          ($positiveSql) AS is_pos, (text IS NOT NULL) AS has_text
       |        FROM documents WHERE doc_id IS NOT NULL),
       |bg0 AS (SELECT doc_id,
       |          md5(t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1]) AS h
       |        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
       |              FROM toks WHERE len(t) >= 2)),
       |bg AS (SELECT doc_id, (${md5b48("h")}) % $buckets AS b FROM bg0),
       |hb AS MATERIALIZED (SELECT bg.doc_id, mem.is_tr, mem.is_pos, bg.b,
       |          CAST(count(*) AS BIGINT) AS occ
       |        FROM bg JOIN mem USING (doc_id) GROUP BY 1, 2, 3, 4),
       |sheet AS (SELECT b,
       |    CAST(sum(CASE WHEN is_pos THEN occ ELSE 0 END) AS BIGINT) AS cp,
       |    CAST(sum(CASE WHEN NOT is_pos THEN occ ELSE 0 END) AS BIGINT) AS cn
       |  FROM hb WHERE is_tr GROUP BY b),
       |${DsirOracle.logChain("sheet", Seq("a" -> "cp + 1", "c" -> "cn + 1"))},
       |u AS (SELECT b, (e_a * 64 + f_a) - (e_c * 64 + f_c) AS u_q FROM l6),
       |tot AS (SELECT
       |    (SELECT CAST(coalesce(sum(CASE WHEN is_pos THEN occ ELSE 0 END), 0) AS BIGINT)
       |       FROM hb WHERE is_tr) AS tcp,
       |    (SELECT CAST(coalesce(sum(CASE WHEN NOT is_pos THEN occ ELSE 0 END), 0) AS BIGINT)
       |       FROM hb WHERE is_tr) AS tcn,
       |    (SELECT CAST(coalesce(sum(CASE WHEN is_pos AND has_text THEN 1 ELSE 0 END), 0) AS BIGINT)
       |       FROM mem WHERE is_tr) AS np,
       |    (SELECT CAST(coalesce(sum(CASE WHEN NOT is_pos AND has_text THEN 1 ELSE 0 END), 0) AS BIGINT)
       |       FROM mem WHERE is_tr) AS nn),
       |${DsirOracle.logChain("tot", Seq(
           "p" -> s"tcp + $buckets", "n" -> s"tcn + $buckets",
           "dp" -> "np + 1", "dn" -> "nn + 1"), keyCols = Seq(), prefix = "k")},
       |consts AS (SELECT
       |    (e_dp * 64 + f_dp) - (e_dn * 64 + f_dn) AS prior_q,
       |    (e_n * 64 + f_n) - (e_p * 64 + f_p) AS k_q FROM k6),
       |per AS (SELECT hb.doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
       |          CAST(sum(occ * coalesce(u.u_q, 0)) AS BIGINT) AS s_feat
       |        FROM hb LEFT JOIN u USING (b) WHERE NOT hb.is_tr GROUP BY hb.doc_id)
       |SELECT m.doc_id,
       |  CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  CAST(c.prior_q + coalesce(per.s_feat, 0)
       |    + coalesce(per.n_bigrams, 0) * c.k_q AS BIGINT) AS score_q,
       |  CAST(CASE WHEN c.prior_q + coalesce(per.s_feat, 0)
       |    + coalesce(per.n_bigrams, 0) * c.k_q >= 0 THEN 1 ELSE 0 END AS BIGINT) AS predicted,
       |  CAST(CASE WHEN m.is_pos THEN 1 ELSE 0 END AS BIGINT) AS actual
       |FROM mem m LEFT JOIN per ON per.doc_id = m.doc_id, consts c
       |WHERE NOT m.is_tr""".stripMargin
  }

  /** q148 mirror of [[graft.operators.Classifier.calibrationSheet]]:
    * the [[sql]] sheet reduced to (score_q, actual), exact decile bin
    * edges (percentile_disc ≡ multiQuantileDisc, the q60 pin), the
    * ≤ 9-comparison bin expression, per-bin counts/bounds with empty
    * bins ranged in (the q144 idiom), the exact two-step fixed-point
    * positive rate, and the adjacent-rate `mono` flag. */
  def calibrationSql(positiveSql: String, trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft",
      bins: Int = 10): String = {
    val edgeDefs = (1 until bins).map { i =>
      val q = (BigDecimal(i) / BigDecimal(bins)).toString
      s"percentile_disc($q) WITHIN GROUP (ORDER BY score_q) AS e$i"
    }.mkString(",\n       |    ")
    val binExpr = (1 until bins).map { i =>
      s"CASE WHEN score_q > e$i THEN 1 ELSE 0 END"
    }.mkString(" + ")
    s"""WITH s AS MATERIALIZED (SELECT score_q, actual FROM (
       |${sql(positiveSql, trainPermille, buckets, salt)}
       |) t),
       |cut AS (SELECT $edgeDefs
       |  FROM s),
       |bn AS (SELECT CAST($binExpr AS BIGINT) AS bin, score_q, actual
       |  FROM s, cut),
       |cnt AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(actual) AS BIGINT) AS n_pos,
       |    CAST(min(score_q) AS BIGINT) AS min_s,
       |    CAST(max(score_q) AS BIGINT) AS max_s
       |  FROM bn GROUP BY bin),
       |ab AS (SELECT CAST(t.i AS BIGINT) AS bin FROM range(0, $bins) t(i)),
       |cc AS (SELECT ab.bin, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n,
       |    CAST(coalesce(cnt.n_pos, 0) AS BIGINT) AS n_pos,
       |    cnt.min_s, cnt.max_s
       |  FROM ab LEFT JOIN cnt USING (bin)),
       |r AS (SELECT bin, n, n_pos, min_s, max_s,
       |    CAST(CASE WHEN n = 0 THEN -1
       |      ELSE ((n_pos * 1024) // n) * 1024 + (((n_pos * 1024) % n) * 1024) // n
       |      END AS BIGINT) AS rate_q
       |  FROM cc),
       |pr AS (SELECT *, last_value(CASE WHEN n > 0 THEN rate_q END IGNORE NULLS)
       |    OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_r
       |  FROM r)
       |SELECT bin, n, n_pos, min_s, max_s, rate_q,
       |  CAST(CASE WHEN n = 0 OR prev_r IS NULL OR prev_r <= rate_q
       |    THEN 1 ELSE 0 END AS BIGINT) AS mono
       |FROM pr""".stripMargin
  }

  /** q147 mirror of [[graft.operators.Classifier.operatingPoints]]:
    * the [[sql]] sheet reduced to (score_q, actual), exact decile
    * thresholds (percentile_disc ≡ multiQuantileDisc, the q60 pin),
    * distinct non-null thresholds, integer confusion counts and the
    * −1.0-guarded IEEE precision/recall divisions. */
  def operatingPointsSql(positiveSql: String, trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): String = {
    val edges = (1 until 10).map { i =>
      val q = (BigDecimal(i) / BigDecimal(10)).toString
      s"percentile_disc($q) WITHIN GROUP (ORDER BY score_q) AS e$i"
    }.mkString(",\n       |    ")
    val list = (1 until 10).map(i => s"e$i").mkString(", ")
    s"""WITH s AS MATERIALIZED (SELECT score_q, actual FROM (
       |${sql(positiveSql, trainPermille, buckets, salt)}
       |) t),
       |cut AS (SELECT $edges
       |  FROM s),
       |thr AS (SELECT DISTINCT u.thr_q
       |  FROM (SELECT unnest([$list]) AS thr_q FROM cut) u
       |  WHERE u.thr_q IS NOT NULL),
       |agg AS (SELECT thr.thr_q,
       |    CAST(sum(CASE WHEN actual = 1 AND score_q >= thr_q THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN actual = 0 AND score_q >= thr_q THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN actual = 1 AND score_q < thr_q THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN actual = 0 AND score_q < thr_q THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM s, thr GROUP BY thr.thr_q)
       |SELECT thr_q, tp, fp, fn, tn,
       |  CASE WHEN tp + fp = 0 THEN -1.0
       |    ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
       |  CASE WHEN tp + fn = 0 THEN -1.0
       |    ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS recall
       |FROM agg""".stripMargin
  }
}
