package graft.queries

/** Generated DuckDB mirror of
  * [[graft.operators.LangId.langIdScores]] — the multi-class Naive
  * Bayes language identifier replayed relationally: the hashed
  * char-trigram feature chain, the (bucket, class) +1-smoothed
  * log-count sheet (train split only), the per-class prior/normalizer
  * constants, the docs×K scoring grid, and the window argmax with
  * class-name tiebreak — every log a [[DsirOracle.logChain]]
  * fixed-point replay, every count a BIGINT, so the per-doc
  * predictions (and the confusion rollup) oracle bitwise. */
object LangIdOracle {

  private def md5b48(hexCol: String): String =
    (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr($hexCol, ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")

  /** The shared chain ending at CTE `pred` (one row per held-out doc
    * per class, with `rn` the score rank and `nxt` the runner-up
    * score). */
  private def predChain(trainPermille: Int, buckets: Int,
      salt: String): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt)
    s"""txt AS MATERIALIZED (SELECT doc_id, lower(text) AS t,
       |          coalesce(lang, 'unknown') AS lang
       |        FROM documents WHERE doc_id IS NOT NULL),
       |mem AS (SELECT doc_id, lang, (t IS NOT NULL) AS has_text,
       |          (($bucket) % 1000 < $trainPermille) AS is_tr
       |        FROM txt),
       |g0 AS (SELECT doc_id, md5(substr(t, CAST(i AS INTEGER), 3)) AS h
       |        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
       |              FROM txt WHERE t IS NOT NULL AND len(t) >= 3)),
       |gb AS (SELECT doc_id, (${md5b48("h")}) % $buckets AS b FROM g0),
       |hb AS MATERIALIZED (SELECT gb.doc_id, m.is_tr, m.lang, gb.b,
       |          CAST(count(*) AS BIGINT) AS occ
       |        FROM gb JOIN mem m USING (doc_id) GROUP BY 1, 2, 3, 4),
       |cls AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_c
       |  FROM mem WHERE is_tr AND has_text GROUP BY 1),
       |tcm AS (SELECT lang, CAST(coalesce(sum(occ), 0) AS BIGINT) AS t_c
       |  FROM hb WHERE is_tr GROUP BY 1),
       |cl AS (SELECT cls.lang, cls.n_c, coalesce(tcm.t_c, 0) AS t_c
       |  FROM cls LEFT JOIN tcm USING (lang)),
       |${DsirOracle.logChain("cl", Seq(
           "p" -> "n_c + 1", "t" -> s"t_c + $buckets"),
           keyCols = Seq("lang"), prefix = "k")},
       |consts AS (SELECT lang AS cls,
       |    (e_p * 64 + f_p) AS prior_q, (e_t * 64 + f_t) AS tlog_q FROM k6),
       |sh0 AS (SELECT b, lang, CAST(sum(occ) AS BIGINT) AS cnt
       |  FROM hb WHERE is_tr GROUP BY 1, 2),
       |${DsirOracle.logChain("sh0", Seq("c" -> "cnt + 1"),
           keyCols = Seq("b", "lang"), prefix = "l")},
       |sheet AS (SELECT b, lang AS cls, (e_c * 64 + f_c) AS lg_q FROM l6),
       |nf AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_grams
       |  FROM hb WHERE NOT is_tr GROUP BY 1),
       |sf AS (SELECT hb.doc_id, s.cls,
       |    CAST(sum(hb.occ * s.lg_q) AS BIGINT) AS s_feat
       |  FROM hb JOIN sheet s USING (b) WHERE NOT hb.is_tr GROUP BY 1, 2),
       |grid AS (SELECT m.doc_id, m.lang, c.cls,
       |    CAST(c.prior_q + coalesce(sf.s_feat, 0)
       |      - coalesce(nf.n_grams, 0) * c.tlog_q AS BIGINT) AS score_q,
       |    CAST(coalesce(nf.n_grams, 0) AS BIGINT) AS n_grams
       |  FROM mem m
       |  LEFT JOIN nf USING (doc_id)
       |  CROSS JOIN consts c
       |  LEFT JOIN sf ON sf.doc_id = m.doc_id AND sf.cls = c.cls
       |  WHERE NOT m.is_tr),
       |pred AS (SELECT doc_id, lang, n_grams, cls, score_q,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_q DESC, cls ASC) AS rn,
       |    lead(score_q, 1) OVER (PARTITION BY doc_id
       |      ORDER BY score_q DESC, cls ASC) AS nxt
       |  FROM grid)""".stripMargin
  }

  /** q181 mirror of [[graft.operators.LangId.langIdConfusion]]. */
  def confusionSql(trainPermille: Int = 500, buckets: Int = 8192,
      salt: String = "graft"): String =
    s"""WITH ${predChain(trainPermille, buckets, salt)}
       |SELECT lang, cls AS predicted_lang,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM pred WHERE rn = 1 GROUP BY 1, 2""".stripMargin
}
