package graft.queries

/** Generated DuckDB mirror of
  * [[graft.operators.Decontaminate.contaminationReport]]: 3-gram
  * shingles (the q28 minhash shingle definition) → md5-bucket split
  * membership (THE q55 split) → df-capped shingle join → per-train-doc
  * distinct-overlap counts. Extracted from the q66 spec so the corpus
  * capstone (q71) can chain the identical CTE block. */
object DecontaminateOracle {

  /** The md5-bucket arithmetic of [[graft.operators.Sampling.withSplitBucket]]
    * as DuckDB SQL over an integer key expression (`doc_id` by
    * default; q104 buckets the cluster id) — first 12 hex digits of
    * md5(salt ∥ key) as a 48-bit integer (shared with
    * q55/q56/q66/q68/q104). */
  def bucketExpr(salt: String = "graft", keyExpr: String = "doc_id"): String =
    (0 until 12).map { j =>
      s"(strpos('0123456789abcdef', substr(md5(concat('$salt', CAST($keyExpr AS VARCHAR))), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
    }.mkString("\n    + ")

  /** q66: (train_id, n_shared_shingles, n_test_docs) for every
    * contaminated training document. */
  def sql(testPermille: Int = 100, maxShingleDf: Int = 20, minOverlap: Int = 3,
      salt: String = "graft"): String = {
    val bucket = bucketExpr(salt)
    s"""WITH docs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks
       |  FROM documents WHERE doc_id IS NOT NULL),
       |sh AS (SELECT doc_id, sh FROM (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
       |    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))) sh FROM docs)),
       |mem AS (SELECT doc_id, (($bucket) % 1000 < $testPermille) AS is_test
       |        FROM documents WHERE doc_id IS NOT NULL),
       |rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $maxShingleDf),
       |capped AS (SELECT s.doc_id, s.sh, m.is_test
       |           FROM sh s JOIN rare USING (sh) JOIN mem m ON m.doc_id = s.doc_id)
       |SELECT a.doc_id AS train_id,
       |  count(DISTINCT a.sh) AS n_shared_shingles,
       |  count(DISTINCT b.doc_id) AS n_test_docs
       |FROM capped a JOIN capped b ON a.sh = b.sh
       |WHERE NOT a.is_test AND b.is_test
       |GROUP BY 1
       |HAVING count(DISTINCT a.sh) >= $minOverlap""".stripMargin
  }
}
