package graft.queries

import graft.operators.Dedup

/** Generated DuckDB mirror of [[graft.operators.Dedup.nearDupPairs]]
  * (MinHash → LSH bands → candidate join → exact Jaccard verify).
  *
  * The permutation family is shared with the Spark side via
  * [[Dedup.minhashCoeffs]]: sig_i = min over shingles of
  * (a_i·x + b_i) mod p, where x is the 48-bit integer from the first 12
  * hex digits of md5(shingle) — ONE digest per shingle, the k
  * permutations are exact BIGINT arithmetic, identical on both engines.
  * The hex→int conversion is spelled digit-by-digit (strpos over the hex
  * alphabet) precisely so the same expression shape runs under DuckDB
  * without engine-specific conv() functions.
  *
  * One CTE chain serves every granularity: [[sql]]/[[containmentSql]]/
  * [[crossSql]] run it over whole documents, the paragraph family
  * ([[paragraphPairsSql]], [[paragraphScrubSql]]) over packed
  * (doc·[[Dedup.ParaPack]] + para_idx) token-block units — the same
  * substitution the Spark side makes. */
object MinhashOracle {

  /** The whole-document base over an arbitrary docs relation:
    * `docs(doc_id, toks)` — `documents` for the standalone oracles,
    * the policy-acted CTE for the q167 capstone. */
  private def docsCte(docsRel: String): String =
    s"""docs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks FROM $docsRel)"""

  private val DocsCte: String = docsCte("documents")

  /** Token-block paragraph base (see
    * [[graft.operators.Dedup.tokenBlockParagraphs]]): `paras(doc_id,
    * para_idx, ptoks)` plus the packed `docs(doc_id, toks)` unit frame
    * the shared chain consumes. */
  private def paraDocsCte(blockTokens: Int): String = {
    val b = blockTokens
    s"""docs0 AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') t
       |          FROM documents WHERE text IS NOT NULL),
       |paras AS (SELECT doc_id, CAST(p AS BIGINT) AS para_idx,
       |            t[(CAST(p AS INTEGER)*$b+1):(CAST(p AS INTEGER)*$b+$b)] AS ptoks
       |          FROM (SELECT doc_id, t, unnest(range(0, (len(t)+${b - 1})//$b)) p FROM docs0)),
       |docs AS (SELECT doc_id * ${Dedup.ParaPack} + para_idx AS doc_id, ptoks AS toks FROM paras)""".stripMargin
  }

  /** `docs(doc_id, toks)` → the shared shingle/signature/band/candidate
    * chain, ending with `cand(a_id, b_id)` and `sets(doc_id, s)`. */
  private def chainFrom(docsCte: String, numHashes: Int, rowsPerBand: Int): String = {
    val values = Dedup.minhashCoeffs(numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val baseExpr = (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5(sh), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")
    s"""$docsCte,
       |sh AS (SELECT doc_id, sh FROM (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
       |    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))) sh FROM docs)),
       |coeffs(i, a, b) AS (VALUES $values),
       |sh2 AS (SELECT doc_id, sh,
       |  ($baseExpr) % ${Dedup.MinhashP} AS hp FROM sh),
       |sigs AS (SELECT doc_id, i, min((hp * a + b) % ${Dedup.MinhashP}) sig
       |         FROM sh2, coeffs GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // $rowsPerBand band, md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) bh
       |          FROM sigs GROUP BY doc_id, i // $rowsPerBand),
       |cand AS (SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
       |          AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list(sh) s FROM sh GROUP BY doc_id)""".stripMargin
  }

  /** The verified-pair closing select: `(a_id, b_id, jacc)` at
    * `threshold`. */
  private def jaccSelect(threshold: Double): String =
    s"""SELECT a_id, b_id,
       |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))) AS jacc
       |FROM cand JOIN sets x ON x.doc_id = a_id JOIN sets y ON y.doc_id = b_id
       |WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))) >= $threshold""".stripMargin

  def sql(numHashes: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.8,
      docsRel: String = "documents"): String =
    s"""WITH ${chainFrom(docsCte(docsRel), numHashes, rowsPerBand)}
       |${jaccSelect(threshold)}""".stripMargin

  /** q145 mirror of [[graft.operators.Dedup.sourceOverlapMatrix]]:
    * the shared q28 pair chain closed by the unordered source-pair
    * census (null sources folded to ''). */
  def sourceOverlapSql(numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.8): String =
    s"""WITH ${chainFrom(DocsCte, numHashes, rowsPerBand)},
       |prs AS (
       |${jaccSelect(threshold)})
       |SELECT least(coalesce(da.source, ''), coalesce(db.source, '')) AS src_a,
       |  greatest(coalesce(da.source, ''), coalesce(db.source, '')) AS src_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM prs
       |JOIN documents da ON da.doc_id = prs.a_id
       |JOIN documents db ON db.doc_id = prs.b_id
       |GROUP BY 1, 2""".stripMargin

  /** Mirror of [[graft.operators.Dedup.paragraphNearDupPairs]]: the
    * shared chain over packed token-block units, unpacked to
    * (a_doc, a_para, b_doc, b_para, jacc), cross-document only. */
  def paragraphPairsSql(blockTokens: Int = 24, numHashes: Int = 16,
      rowsPerBand: Int = 4, threshold: Double = 0.8): String = {
    val pk = Dedup.ParaPack
    s"""WITH ${chainFrom(paraDocsCte(blockTokens), numHashes, rowsPerBand)}
       |SELECT CAST(a_id // $pk AS BIGINT) AS a_doc, CAST(a_id % $pk AS BIGINT) AS a_para,
       |       CAST(b_id // $pk AS BIGINT) AS b_doc, CAST(b_id % $pk AS BIGINT) AS b_para, jacc
       |FROM (${jaccSelect(threshold)})
       |WHERE a_id // $pk <> b_id // $pk""".stripMargin
  }

  /** Mirror of [[graft.operators.Dedup.scrubDupParagraphs]]: drop every
    * paragraph appearing as the b-side of a cross-document verified
    * pair (keep-first), reassemble survivors in paragraph order. */
  def paragraphScrubSql(blockTokens: Int = 24, numHashes: Int = 16,
      rowsPerBand: Int = 4, threshold: Double = 0.8): String = {
    val pk = Dedup.ParaPack
    s"""WITH ${chainFrom(paraDocsCte(blockTokens), numHashes, rowsPerBand)},
       |drops AS (SELECT DISTINCT b_id FROM (${jaccSelect(threshold)})
       |          WHERE a_id // $pk <> b_id // $pk),
       |kept AS (SELECT p.doc_id, p.para_idx, array_to_string(p.ptoks, ' ') AS para
       |         FROM paras p LEFT JOIN drops d ON p.doc_id * $pk + p.para_idx = d.b_id
       |         WHERE d.b_id IS NULL),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |               string_agg(para, ' ' ORDER BY para_idx) AS clean_text
       |        FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras FROM paras GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(agg.clean_text, '') AS clean_text,
       |  CAST(coalesce(tot.n_paras, 0) AS BIGINT) AS n_paras,
       |  CAST(coalesce(tot.n_paras, 0) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_dropped
       |FROM documents d
       |LEFT JOIN tot ON d.doc_id = tot.doc_id
       |LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin
  }

  /** Mirror of [[graft.operators.Dedup.minhashRecallAudit]]: the shared
    * chain over the id-bounded doc slice, an exact-Jaccard arm built by
    * joining the slice's distinct (doc, sh) rows on shingle equality
    * (the SAME co-shingled-pairs formulation as the Spark side — never
    * the all-pairs cross product), pairs bucketed by the highest
    * threshold ≤ jacc, hits via LEFT JOIN against `cand`. The chain's
    * per-doc `list_distinct` IS the slice-wide (doc, sh) distinct (a
    * shingle cannot span documents), so both arms read one shingle
    * definition. */
  def recallAuditSql(idBound: Long = 600L, numHashes: Int = 16,
      rowsPerBand: Int = 4,
      thresholds: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.8, 0.9)): String = {
    val bounded =
      s"""docs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks
         |         FROM documents WHERE doc_id < $idBound)""".stripMargin
    val cases = thresholds.reverse
      .map(t => s"WHEN t.jacc >= CAST($t AS DOUBLE) THEN CAST($t AS DOUBLE)")
      .mkString(" ")
    s"""WITH ${chainFrom(bounded, numHashes, rowsPerBand)},
       |tp0 AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) AS n_int
       |        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2),
       |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |tp AS (SELECT a_id, b_id,
       |         CAST(n_int AS DOUBLE) / (ca.n_sh + cb.n_sh - n_int) AS jacc
       |       FROM tp0 JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id),
       |banded AS (SELECT CASE $cases END AS t_lo,
       |                  CASE WHEN c.a_id IS NULL THEN 0 ELSE 1 END AS hit
       |           FROM tp t LEFT JOIN cand c ON c.a_id = t.a_id AND c.b_id = t.b_id),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand)
       |SELECT t_lo, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(sum(hit) AS BIGINT) AS n_hits,
       |  CAST(CAST(sum(hit) AS BIGINT) AS DOUBLE) / count(*) AS recall,
       |  n_candidates
       |FROM banded, tot WHERE t_lo IS NOT NULL
       |GROUP BY t_lo, n_candidates""".stripMargin
  }

  /** Mirror of [[graft.operators.Dedup.containmentPairs]]: identical
    * signature/band/candidate CTEs as [[sql]], closing on shingle-set
    * containment |A∩B| / min(|A|, |B|) with the integer counts
    * exposed. */
  def containmentSql(numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): String =
    s"""WITH ${chainFrom(DocsCte, numHashes, rowsPerBand)},
       |ov AS (SELECT a_id, b_id,
       |  CAST(len(list_intersect(x.s, y.s)) AS BIGINT) AS n_int,
       |  CAST(len(x.s) AS BIGINT) AS n_a, CAST(len(y.s) AS BIGINT) AS n_b
       | FROM cand JOIN sets x ON x.doc_id = a_id JOIN sets y ON y.doc_id = b_id)
       |SELECT a_id, b_id, n_int, n_a, n_b,
       |  CAST(n_int AS DOUBLE) / least(n_a, n_b) AS cont
       |FROM ov WHERE CAST(n_int AS DOUBLE) / least(n_a, n_b) >= $threshold""".stripMargin

  /** Mirror of [[graft.operators.Dedup.scrubBoilerplateUnits]]: the
    * token-block unit frame of [[paragraphScrubSql]], an EXACT
    * prevalence census on the unit's 48-bit md5 key (the same
    * digit-by-digit base as the minhash chain, over md5 of the
    * space-rejoined unit), drop every occurrence of units in ≥
    * `minDocs` distinct documents, reassemble survivors in unit
    * order. */
  def boilerplateScrubSql(blockTokens: Int = 24, minDocs: Long = 2L): String = {
    val ukExpr = (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5(para), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")
    s"""WITH ${paraDocsCte(blockTokens)},
       |u AS (SELECT doc_id, para_idx, array_to_string(ptoks, ' ') AS para FROM paras),
       |k AS (SELECT doc_id, para_idx, para, ($ukExpr) AS uk FROM u),
       |boiler AS (SELECT uk FROM (
       |    SELECT uk, count(DISTINCT doc_id) AS df FROM k GROUP BY uk)
       |  WHERE df >= $minDocs),
       |kept AS (SELECT k.doc_id, k.para_idx, k.para
       |         FROM k LEFT JOIN boiler b ON k.uk = b.uk WHERE b.uk IS NULL),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |               string_agg(para, ' ' ORDER BY para_idx) AS clean_text
       |        FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_units FROM u GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(agg.clean_text, '') AS clean_text,
       |  CAST(coalesce(tot.n_units, 0) AS BIGINT) AS n_units,
       |  CAST(coalesce(tot.n_units, 0) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_dropped
       |FROM documents d
       |LEFT JOIN tot ON d.doc_id = tot.doc_id
       |LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin
  }

  /** Mirror of [[graft.operators.Dedup.scrubBoilerplateIncrement]] —
    * deliberately the MONOLITHIC form: census over standing ∪ batch
    * (the whole corpus), scrub read only for batch docs (md5-bucket
    * membership, is_new ⇔ bucket < `newPermille` — the q68 split), so
    * the hash match proves incremental == monolithic. */
  def incrementalBoilerplateSql(blockTokens: Int = 24, minDocs: Long = 2L,
      newPermille: Int = 100, salt: String = "graft"): String = {
    val ukExpr = (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5(para), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")
    val bucket = DecontaminateOracle.bucketExpr(salt)
    s"""WITH ${paraDocsCte(blockTokens)},
       |mem AS (SELECT doc_id, (($bucket) % 1000 < $newPermille) AS is_new
       |        FROM documents WHERE doc_id IS NOT NULL),
       |u AS (SELECT doc_id, para_idx, array_to_string(ptoks, ' ') AS para FROM paras),
       |k AS (SELECT doc_id, para_idx, para, ($ukExpr) AS uk FROM u),
       |boiler AS (SELECT uk FROM (
       |    SELECT uk, count(DISTINCT doc_id) AS df FROM k GROUP BY uk)
       |  WHERE df >= $minDocs),
       |kept AS (SELECT k.doc_id, k.para_idx, k.para
       |         FROM k JOIN mem m ON m.doc_id = k.doc_id AND m.is_new
       |         LEFT JOIN boiler b ON k.uk = b.uk WHERE b.uk IS NULL),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |               string_agg(para, ' ' ORDER BY para_idx) AS clean_text
       |        FROM kept GROUP BY doc_id),
       |tot AS (SELECT u.doc_id, CAST(count(*) AS BIGINT) AS n_units
       |        FROM u JOIN mem m ON m.doc_id = u.doc_id AND m.is_new
       |        GROUP BY u.doc_id)
       |SELECT d.doc_id,
       |  coalesce(agg.clean_text, '') AS clean_text,
       |  CAST(coalesce(tot.n_units, 0) AS BIGINT) AS n_units,
       |  CAST(coalesce(tot.n_units, 0) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_dropped
       |FROM documents d
       |JOIN mem m ON m.doc_id = d.doc_id AND m.is_new
       |LEFT JOIN tot ON d.doc_id = tot.doc_id
       |LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin
  }

  /** Mirror of [[graft.operators.Dedup.crossNearDupPairs]] with the
    * md5-bucket split as membership (is_new ⇔ bucket < `newPermille`,
    * the [[graft.operators.Sampling.withSplitBucket]] definition):
    * same signature/band CTEs as [[sql]], candidate join restricted to
    * new-side × corpus-side. */
  def crossSql(numHashes: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.8,
      newPermille: Int = 100, salt: String = "graft"): String = {
    val values = Dedup.minhashCoeffs(numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val baseExpr = (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5(sh), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")
    val bucketExpr = (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5(concat('$salt', CAST(doc_id AS VARCHAR))), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")
    s"""WITH docs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks FROM documents),
       |mem AS (SELECT doc_id, (($bucketExpr) % 1000 < $newPermille) is_new
       |        FROM documents WHERE doc_id IS NOT NULL),
       |sh AS (SELECT doc_id, sh FROM (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
       |    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))) sh FROM docs)),
       |coeffs(i, a, b) AS (VALUES $values),
       |sh2 AS (SELECT doc_id, sh,
       |  ($baseExpr) % ${Dedup.MinhashP} AS hp FROM sh),
       |sigs AS (SELECT doc_id, i, min((hp * a + b) % ${Dedup.MinhashP}) sig
       |         FROM sh2, coeffs GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // $rowsPerBand band, md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) bh
       |          FROM sigs GROUP BY doc_id, i // $rowsPerBand),
       |cand AS (SELECT DISTINCT a.doc_id new_id, b.doc_id corpus_id
       |         FROM bands a JOIN mem ma ON ma.doc_id = a.doc_id AND ma.is_new
       |         JOIN bands b ON a.band = b.band AND a.bh = b.bh
       |         JOIN mem mb ON mb.doc_id = b.doc_id AND NOT mb.is_new),
       |sets AS (SELECT doc_id, list(sh) s FROM sh GROUP BY doc_id)
       |SELECT new_id, corpus_id,
       |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))) AS jacc
       |FROM cand JOIN sets x ON x.doc_id = new_id JOIN sets y ON y.doc_id = corpus_id
       |WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))) >= $threshold""".stripMargin
  }
}
