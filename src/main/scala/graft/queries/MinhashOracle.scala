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
  * without engine-specific conv() functions. */
object MinhashOracle {

  def sql(numHashes: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.8): String = {
    val values = Dedup.minhashCoeffs(numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val baseExpr = (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5(sh), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")
    s"""WITH docs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks FROM documents),
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
       |sets AS (SELECT doc_id, list(sh) s FROM sh GROUP BY doc_id)
       |SELECT a_id, b_id,
       |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))) AS jacc
       |FROM cand JOIN sets x ON x.doc_id = a_id JOIN sets y ON y.doc_id = b_id
       |WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(list_concat(x.s, y.s))) >= $threshold""".stripMargin
  }

  /** Mirror of [[graft.operators.Dedup.containmentPairs]]: identical
    * signature/band/candidate CTEs as [[sql]], closing on shingle-set
    * containment |A∩B| / min(|A|, |B|) with the integer counts
    * exposed. */
  def containmentSql(numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): String = {
    val values = Dedup.minhashCoeffs(numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val baseExpr = (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5(sh), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")
    s"""WITH docs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks FROM documents),
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
       |sets AS (SELECT doc_id, list(sh) s FROM sh GROUP BY doc_id),
       |ov AS (SELECT a_id, b_id,
       |  CAST(len(list_intersect(x.s, y.s)) AS BIGINT) AS n_int,
       |  CAST(len(x.s) AS BIGINT) AS n_a, CAST(len(y.s) AS BIGINT) AS n_b
       | FROM cand JOIN sets x ON x.doc_id = a_id JOIN sets y ON y.doc_id = b_id)
       |SELECT a_id, b_id, n_int, n_a, n_b,
       |  CAST(n_int AS DOUBLE) / least(n_a, n_b) AS cont
       |FROM ov WHERE CAST(n_int AS DOUBLE) / least(n_a, n_b) >= $threshold""".stripMargin
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
