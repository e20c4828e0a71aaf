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

  /** The shared chain ending at CTE `pred` (one row per scored doc
    * per class, with `rn` the score rank and `nxt` the runner-up
    * score). `scoreAll = false` scores the held-out split only (the
    * q181/q185 evidence seat); `true` scores EVERY doc (the q184 act
    * and the q188 standing baseline — the model still trains on the
    * train split alone). `from` re-roots the corpus. */
  private def predChain(trainPermille: Int, buckets: Int,
      salt: String, from: String = "documents",
      scoreAll: Boolean = false): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt)
    val pop = if (scoreAll) "TRUE" else "NOT is_tr"
    val popM = if (scoreAll) "TRUE" else "NOT m.is_tr"
    val popHb = if (scoreAll) "TRUE" else "NOT hb.is_tr"
    s"""txt AS MATERIALIZED (SELECT doc_id, lower(text) AS t,
       |          coalesce(lang, 'unknown') AS lang
       |        FROM $from WHERE doc_id IS NOT NULL),
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
       |  FROM hb WHERE $pop GROUP BY 1),
       |sf AS (SELECT hb.doc_id, s.cls,
       |    CAST(sum(hb.occ * s.lg_q) AS BIGINT) AS s_feat
       |  FROM hb JOIN sheet s USING (b) WHERE $popHb GROUP BY 1, 2),
       |grid AS (SELECT m.doc_id, m.lang, c.cls,
       |    CAST(c.prior_q + coalesce(sf.s_feat, 0)
       |      - coalesce(nf.n_grams, 0) * c.tlog_q AS BIGINT) AS score_q,
       |    CAST(coalesce(nf.n_grams, 0) AS BIGINT) AS n_grams
       |  FROM mem m
       |  LEFT JOIN nf USING (doc_id)
       |  CROSS JOIN consts c
       |  LEFT JOIN sf ON sf.doc_id = m.doc_id AND sf.cls = c.cls
       |  WHERE $popM),
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

  /** q184 mirror of [[graft.operators.LangId.applyLangId]]: the
    * [[predChain]] with `scoreAll` (the act labels the WHOLE corpus,
    * train docs included), closed by the argmax row and the
    * margin-threshold abstain CASE — the CCNet drop rule replayed
    * relationally. */
  def applySql(marginThresholdQ: Long, trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): String =
    s"""WITH ${predChain(trainPermille, buckets, salt, scoreAll = true)}
       |SELECT doc_id, lang, n_grams, cls AS predicted_lang,
       |  CAST(score_q - coalesce(nxt, score_q) AS BIGINT) AS margin_q,
       |  CASE WHEN score_q - coalesce(nxt, score_q) < $marginThresholdQ
       |    THEN 'unknown' ELSE cls END AS lang_id
       |FROM pred WHERE rn = 1""".stripMargin

  /** q185 mirror of [[graft.operators.LangId.langIdOperatingPoints]]:
    * held-out (margin, correct) rows, exact margin deciles
    * (percentile_disc ≡ the radix selection, the q60 pin), distinct
    * non-null thresholds, integer abstain/scored/correct counts and
    * the −1.0-guarded IEEE divisions — the q147 sweep shape on the
    * abstain knob. */
  def operatingPointsSql(trainPermille: Int = 500, buckets: Int = 8192,
      salt: String = "graft"): String = {
    val edges = (1 until 10).map { i =>
      val q = (BigDecimal(i) / BigDecimal(10)).toString
      s"percentile_disc($q) WITHIN GROUP (ORDER BY margin_q) AS e$i"
    }.mkString(",\n       |    ")
    val list = (1 until 10).map(i => s"e$i").mkString(", ")
    s"""WITH ${predChain(trainPermille, buckets, salt)},
       |s AS MATERIALIZED (SELECT
       |    CAST(score_q - coalesce(nxt, score_q) AS BIGINT) AS margin_q,
       |    CASE WHEN cls = lang THEN 1 ELSE 0 END AS correct
       |  FROM pred WHERE rn = 1),
       |cut AS (SELECT $edges
       |  FROM s),
       |thr AS (SELECT DISTINCT u.thr_q
       |  FROM (SELECT unnest([$list]) AS thr_q FROM cut) u
       |  WHERE u.thr_q IS NOT NULL),
       |agg AS (SELECT thr.thr_q,
       |    CAST(sum(CASE WHEN margin_q < thr_q THEN 1 ELSE 0 END) AS BIGINT) AS n_abstain,
       |    CAST(sum(CASE WHEN margin_q >= thr_q THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
       |    CAST(sum(CASE WHEN margin_q >= thr_q AND correct = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       |  FROM s, thr GROUP BY thr.thr_q)
       |SELECT thr_q, n_abstain, n_scored, n_correct,
       |  CASE WHEN n_scored = 0 THEN -1.0
       |    ELSE CAST(n_correct AS DOUBLE) / n_scored END AS accuracy,
       |  CAST(n_abstain AS DOUBLE) / (n_abstain + n_scored) AS abstain_rate
       |FROM agg""".stripMargin
  }

  /** The q188/q192 shared drift CTEs: the corpus split on the
    * INDEPENDENT arrivals salt (`std`/`inc`), the [[predChain]]
    * re-rooted on the standing slice with `scoreAll` (closing as the
    * `dcnt`/`tg` baseline), and a second trigram/scoring chain over
    * the incoming slice against the SAME consts/sheet (closing as
    * `pred2`). Emitted WITHOUT the leading WITH. */
  private def driftChainCtes(newPermille: Int, trainPermille: Int,
      buckets: Int, salt: String, arrivalSalt: String): String = {
    val arr = DecontaminateOracle.bucketExpr(arrivalSalt)
    s"""std AS MATERIALIZED (SELECT * FROM documents
       |  WHERE doc_id IS NOT NULL AND (($arr) % 1000) >= $newPermille),
       |inc AS MATERIALIZED (SELECT * FROM documents
       |  WHERE doc_id IS NOT NULL AND (($arr) % 1000) < $newPermille),
       |${predChain(trainPermille, buckets, salt, from = "std",
           scoreAll = true)},
       |dcnt AS (SELECT cls, CAST(count(*) AS BIGINT) AS c_gb
       |  FROM pred WHERE rn = 1 GROUP BY 1),
       |tg AS (SELECT CAST(coalesce(sum(c_gb), 0) AS BIGINT) AS t_g FROM dcnt),
       |txt2 AS (SELECT doc_id, lower(text) AS t FROM inc),
       |g02 AS (SELECT doc_id, md5(substr(t, CAST(i AS INTEGER), 3)) AS h
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
       |        FROM txt2 WHERE t IS NOT NULL AND len(t) >= 3)),
       |hb2 AS (SELECT doc_id, (${md5b48("h")}) % $buckets AS b,
       |    CAST(count(*) AS BIGINT) AS occ
       |  FROM g02 GROUP BY 1, 2),
       |nf2 AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_grams
       |  FROM hb2 GROUP BY 1),
       |sf2 AS (SELECT hb2.doc_id, s.cls,
       |    CAST(sum(hb2.occ * s.lg_q) AS BIGINT) AS s_feat
       |  FROM hb2 JOIN sheet s USING (b) GROUP BY 1, 2),
       |grid2 AS (SELECT m.doc_id, c.cls,
       |    CAST(c.prior_q + coalesce(sf2.s_feat, 0)
       |      - coalesce(nf2.n_grams, 0) * c.tlog_q AS BIGINT) AS score_q
       |  FROM txt2 m
       |  LEFT JOIN nf2 USING (doc_id)
       |  CROSS JOIN consts c
       |  LEFT JOIN sf2 ON sf2.doc_id = m.doc_id AND sf2.cls = c.cls),
       |pred2 AS (SELECT doc_id, cls,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_q DESC, cls ASC) AS rn
       |  FROM grid2)""".stripMargin
  }

  /** q188 mirror of [[graft.operators.LangId.langDistDrift]]: the
    * shared [[driftChainCtes]] closed by the one-row q158 KL over the
    * K-class support — every log the fixed-point replay. */
  def langDistDriftSql(newPermille: Int = 100, trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft",
      arrivalSalt: String = "arrivals", alertQ: Long = 32L): String =
    s"""WITH ${driftChainCtes(newPermille, trainPermille, buckets, salt,
           arrivalSalt)},
       |bcnt AS (SELECT cls, CAST(count(*) AS BIGINT) AS c_bb
       |  FROM pred2 WHERE rn = 1 GROUP BY 1),
       |tb AS (SELECT CAST(coalesce(sum(c_bb), 0) AS BIGINT) AS t_b FROM bcnt),
       |ks AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM consts),
       |kgrid AS (SELECT c.cls, CAST(coalesce(b.c_bb, 0) AS BIGINT) AS c_bb,
       |    CAST(coalesce(g.c_gb, 0) AS BIGINT) AS c_gb, tb.t_b, tg.t_g, ks.kk
       |  FROM consts c
       |  LEFT JOIN bcnt b ON b.cls = c.cls
       |  LEFT JOIN dcnt g ON g.cls = c.cls, tb, tg, ks),
       |${DsirOracle.logChain("kgrid", Seq(
           "a" -> "c_bb + 1", "c" -> "t_b + kk",
           "d" -> "c_gb + 1", "g" -> "t_g + kk"),
         keyCols = Seq("c_bb", "t_b", "kk"), prefix = "z")},
       |lr AS (SELECT c_bb, t_b, kk,
       |    (e_a * 64 + f_a) - (e_c * 64 + f_c)
       |      - (e_d * 64 + f_d) + (e_g * 64 + f_g) AS dq
       |  FROM z6),
       |agg AS (SELECT CAST(max(t_b) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN c_bb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_langs,
       |    CAST(sum((c_bb + 1) * dq) AS BIGINT) AS num,
       |    CAST(max(kk) AS BIGINT) AS kk
       |  FROM lr),
       |klc AS (SELECT n_docs, n_langs,
       |    CAST(CASE WHEN n_docs = 0 THEN NULL
       |         WHEN num >= 0 THEN num // (n_docs + kk)
       |         ELSE -((-num) // (n_docs + kk)) END AS BIGINT) AS kl_q
       |  FROM agg)
       |SELECT n_docs, n_langs, kl_q,
       |  CAST(CASE WHEN kl_q >= $alertQ THEN 1 ELSE 0 END AS BIGINT) AS alert
       |FROM klc""".stripMargin

  /** q192 mirror of [[graft.operators.LangId.langDistDriftBySource]]:
    * the shared [[driftChainCtes]] with arrival predictions joined
    * back to their sources, closed by the per-source K-class KL —
    * every window of the engine's close replayed as per-source
    * grouping. */
  def langDistDriftBySourceSql(newPermille: Int = 100,
      trainPermille: Int = 500, buckets: Int = 8192,
      salt: String = "graft", arrivalSalt: String = "arrivals"): String =
    s"""WITH ${driftChainCtes(newPermille, trainPermille, buckets, salt,
           arrivalSalt)},
       |psrc AS (SELECT p.doc_id, p.cls,
       |    coalesce(d.source, 'unknown') AS source
       |  FROM pred2 p JOIN inc d ON d.doc_id = p.doc_id
       |  WHERE p.rn = 1),
       |bcnt AS (SELECT source, cls, CAST(count(*) AS BIGINT) AS c_bb
       |  FROM psrc GROUP BY 1, 2),
       |ts AS (SELECT source, CAST(sum(c_bb) AS BIGINT) AS t_b
       |  FROM bcnt GROUP BY 1),
       |ks AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM consts),
       |srcs AS (SELECT DISTINCT coalesce(source, 'unknown') AS source
       |  FROM inc),
       |kgrid AS (SELECT s.source, c.cls,
       |    CAST(coalesce(b.c_bb, 0) AS BIGINT) AS c_bb,
       |    CAST(coalesce(g.c_gb, 0) AS BIGINT) AS c_gb,
       |    CAST(coalesce(ts.t_b, 0) AS BIGINT) AS t_b, tg.t_g, ks.kk
       |  FROM srcs s
       |  CROSS JOIN consts c
       |  LEFT JOIN bcnt b ON b.source = s.source AND b.cls = c.cls
       |  LEFT JOIN dcnt g ON g.cls = c.cls
       |  LEFT JOIN ts ON ts.source = s.source, tg, ks),
       |${DsirOracle.logChain("kgrid", Seq(
           "a" -> "c_bb + 1", "c" -> "t_b + kk",
           "d" -> "c_gb + 1", "g" -> "t_g + kk"),
         keyCols = Seq("source", "c_bb", "t_b", "kk"), prefix = "z")},
       |lr AS (SELECT source, c_bb, t_b, kk,
       |    (e_a * 64 + f_a) - (e_c * 64 + f_c)
       |      - (e_d * 64 + f_d) + (e_g * 64 + f_g) AS dq
       |  FROM z6),
       |agg AS (SELECT source, CAST(max(t_b) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN c_bb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_langs,
       |    CAST(sum((c_bb + 1) * dq) AS BIGINT) AS num,
       |    CAST(max(kk) AS BIGINT) AS kk
       |  FROM lr GROUP BY 1)
       |SELECT source, n_docs, n_langs,
       |  CAST(CASE WHEN n_docs = 0 THEN NULL
       |       WHEN num >= 0 THEN num // (n_docs + kk)
       |       ELSE -((-num) // (n_docs + kk)) END AS BIGINT) AS kl_q
       |FROM agg""".stripMargin

  /** q193 mirror of [[graft.operators.LangId.langKlBySource]] — the
    * fifth scorecard member: the [[predChain]] with `scoreAll` (every
    * doc scores, the q184 act at threshold 0), predictions joined
    * back to their sources, per-source predicted-language counts
    * spread over the K-class support, and the exact add-1-smoothed
    * per-source KL against the CORPUS'S OWN totals (the
    * [[DsirOracle.sourceKlSql]] self-seat convention with languages
    * in the bucket seat) — every log the fixed-point replay, the
    * q192 close with the corpus in the baseline seat. */
  def langKlBySourceSql(trainPermille: Int = 500, buckets: Int = 8192,
      salt: String = "graft"): String =
    s"""WITH ${predChain(trainPermille, buckets, salt, scoreAll = true)},
       |psrc AS (SELECT p.doc_id, p.cls,
       |    coalesce(d.source, 'unknown') AS source
       |  FROM pred p JOIN documents d ON d.doc_id = p.doc_id
       |  WHERE p.rn = 1),
       |bcnt AS (SELECT source, cls, CAST(count(*) AS BIGINT) AS c_bb
       |  FROM psrc GROUP BY 1, 2),
       |gcnt AS (SELECT cls, CAST(sum(c_bb) AS BIGINT) AS c_gb
       |  FROM bcnt GROUP BY 1),
       |tg AS (SELECT CAST(coalesce(sum(c_bb), 0) AS BIGINT) AS t_g FROM bcnt),
       |ts AS (SELECT source, CAST(sum(c_bb) AS BIGINT) AS t_b
       |  FROM bcnt GROUP BY 1),
       |ks AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM consts),
       |srcs AS (SELECT DISTINCT coalesce(source, 'unknown') AS source
       |  FROM documents WHERE doc_id IS NOT NULL),
       |kgrid AS (SELECT s.source, c.cls,
       |    CAST(coalesce(b.c_bb, 0) AS BIGINT) AS c_bb,
       |    CAST(coalesce(g.c_gb, 0) AS BIGINT) AS c_gb,
       |    CAST(coalesce(ts.t_b, 0) AS BIGINT) AS t_b, tg.t_g, ks.kk
       |  FROM srcs s
       |  CROSS JOIN consts c
       |  LEFT JOIN bcnt b ON b.source = s.source AND b.cls = c.cls
       |  LEFT JOIN gcnt g ON g.cls = c.cls
       |  LEFT JOIN ts ON ts.source = s.source, tg, ks),
       |${DsirOracle.logChain("kgrid", Seq(
           "a" -> "c_bb + 1", "c" -> "t_b + kk",
           "d" -> "c_gb + 1", "g" -> "t_g + kk"),
         keyCols = Seq("source", "c_bb", "t_b", "kk"), prefix = "z")},
       |lr AS (SELECT source, c_bb, t_b, kk,
       |    (e_a * 64 + f_a) - (e_c * 64 + f_c)
       |      - (e_d * 64 + f_d) + (e_g * 64 + f_g) AS dq
       |  FROM z6),
       |agg AS (SELECT source, CAST(max(t_b) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN c_bb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_langs,
       |    CAST(sum((c_bb + 1) * dq) AS BIGINT) AS num,
       |    CAST(max(kk) AS BIGINT) AS kk
       |  FROM lr GROUP BY 1)
       |SELECT source, n_docs, n_langs,
       |  CAST(CASE WHEN n_docs = 0 THEN NULL
       |       WHEN num >= 0 THEN num // (n_docs + kk)
       |       ELSE -((-num) // (n_docs + kk)) END AS BIGINT) AS kl_q
       |FROM agg""".stripMargin

  /** q195 mirror of
    * [[graft.operators.LangId.langIdModelIncrement]] — deliberately
    * MONOLITHIC (the q105/q109/q119 incremental-family convention):
    * the [[predChain]] trains over ALL documents at once and the
    * patched relational sheet reads straight off its `cl` / `sh0` /
    * `consts` / `sheet` CTEs, so the hash match PROVES the Spark
    * side's standing+batch counts fold equals a full retrain. One
    * row per trained (class, bucket) cell carrying the class
    * constants; a trigram-free class keeps its `(cls, NULL, 0, 0)`
    * row. */
  def modelIncrementSql(trainPermille: Int = 500, buckets: Int = 8192,
      salt: String = "graft"): String =
    s"""WITH ${predChain(trainPermille, buckets, salt)}
       |SELECT c.cls, CAST(s0.b AS BIGINT) AS b,
       |  CAST(coalesce(s0.cnt, 0) AS BIGINT) AS cnt,
       |  CAST(coalesce(sh.lg_q, 0) AS BIGINT) AS lg_q,
       |  CAST(cl.n_c AS BIGINT) AS n_c,
       |  CAST(cl.t_c AS BIGINT) AS t_c,
       |  CAST(c.prior_q AS BIGINT) AS prior_q,
       |  CAST(c.tlog_q AS BIGINT) AS tlog_q
       |FROM consts c
       |JOIN cl ON cl.lang = c.cls
       |LEFT JOIN sh0 s0 ON s0.lang = c.cls
       |LEFT JOIN sheet sh ON sh.cls = c.cls AND sh.b = s0.b""".stripMargin

  /** q191 mirror: the [[applySql]] act embedded as a derived table,
    * joined back to the corpus and rolled onto (source, lang_id) —
    * the q76 composition-sheet mechanics keyed on the MINTED label. */
  def compositionSql(marginThresholdQ: Long, trainPermille: Int = 500,
      buckets: Int = 8192, salt: String = "graft"): String =
    s"""WITH act AS MATERIALIZED (SELECT doc_id, lang_id FROM (
       |${applySql(marginThresholdQ, trainPermille, buckets, salt)}
       |) t_a)
       |SELECT d.source, a.lang_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(string_split_regex(coalesce(d.text, ''), '\\s+'))) AS BIGINT) AS n_tokens
       |FROM documents d JOIN act a ON a.doc_id = d.doc_id
       |GROUP BY 1, 2""".stripMargin
}
