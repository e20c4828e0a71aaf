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

  /** The shared docs/sh/mem/rare/capped CTE prefix — ONE textual
    * definition of the evidence frame (the
    * [[graft.operators.Decontaminate]] `cappedSplitShingles` mirror),
    * so [[sql]], [[evalSql]] and [[bloomSql]]'s test side cannot
    * silently audit different corpora. */
  private def baseCtes(testPermille: Int, salt: String,
      docsRel: String = "documents"): String = {
    val bucket = bucketExpr(salt)
    s"""docs AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') toks
       |  FROM $docsRel WHERE doc_id IS NOT NULL),
       |sh AS (SELECT doc_id, sh FROM (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
       |    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))) sh FROM docs)),
       |mem AS (SELECT doc_id, (($bucket) % 1000 < $testPermille) AS is_test
       |        FROM $docsRel WHERE doc_id IS NOT NULL)""".stripMargin
  }

  private def cappedCtes(testPermille: Int, maxShingleDf: Int, salt: String,
      docsRel: String = "documents"): String =
    s"""${baseCtes(testPermille, salt, docsRel)},
       |rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $maxShingleDf),
       |capped AS (SELECT s.doc_id, s.sh, m.is_test
       |           FROM sh s JOIN rare USING (sh) JOIN mem m ON m.doc_id = s.doc_id)""".stripMargin

  /** q66: (train_id, n_shared_shingles, n_test_docs) for every
    * contaminated training document. */
  def sql(testPermille: Int = 100, maxShingleDf: Int = 20, minOverlap: Int = 3,
      salt: String = "graft", docsRel: String = "documents"): String =
    s"""WITH ${cappedCtes(testPermille, maxShingleDf, salt, docsRel)}
       |SELECT a.doc_id AS train_id,
       |  count(DISTINCT a.sh) AS n_shared_shingles,
       |  count(DISTINCT b.doc_id) AS n_test_docs
       |FROM capped a JOIN capped b ON a.sh = b.sh
       |WHERE NOT a.is_test AND b.is_test
       |GROUP BY 1
       |HAVING count(DISTINCT a.sh) >= $minOverlap""".stripMargin

  /** q121 mirror of
    * [[graft.operators.Decontaminate.evalContaminationReport]]: the
    * SAME [[cappedCtes]] prefix as [[sql]] (by construction, not by
    * copy), closed pair-level (≥ minOverlap distinct shared shingles
    * per (test, train) pair) then rolled up per test doc. */
  def evalSql(testPermille: Int = 100, maxShingleDf: Int = 20, minOverlap: Int = 3,
      salt: String = "graft"): String =
    s"""WITH ${cappedCtes(testPermille, maxShingleDf, salt)},
       |pairs AS (SELECT b.doc_id AS test_id, a.doc_id AS train_id,
       |            count(DISTINCT a.sh) AS n_pair
       |          FROM capped a JOIN capped b ON a.sh = b.sh
       |          WHERE NOT a.is_test AND b.is_test
       |          GROUP BY 1, 2
       |          HAVING count(DISTINCT a.sh) >= $minOverlap)
       |SELECT test_id,
       |  CAST(count(*) AS BIGINT) AS n_train_docs,
       |  CAST(max(n_pair) AS BIGINT) AS max_overlap
       |FROM pairs GROUP BY 1""".stripMargin

  /** q116 mirror of
    * [[graft.operators.Decontaminate.bloomContaminationCandidates]]:
    * same shingle/membership CTEs as [[sql]]; the Bloom filter is the
    * distinct set of probe positions of the test-df-capped eval
    * shingles (probe `j` = hex digits [8j+1, 8j+8] of md5(sh), a
    * 32-bit integer, mod `mBits` — the digit-by-digit base shared with
    * every md5-keyed oracle); a train shingle is a candidate iff all 4
    * of its positions are set. */
  def bloomSql(testPermille: Int = 100, mBits: Long = 1L << 18,
      maxTestDf: Int = 20, minOverlap: Int = 3,
      salt: String = "graft"): String = {
    def pos(j: Int): String = "(" + (0 until 8).map { i =>
      s"(strpos('0123456789abcdef', substr(md5(sh), ${8 * j + i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}"
    }.mkString("\n      + ") + s") % $mBits"
    val posList = (0 until 4).map(pos).mkString("[", ",\n    ", "]")
    s"""WITH ${baseCtes(testPermille, salt)},
       |tsh AS (SELECT s.sh FROM sh s JOIN mem m ON m.doc_id = s.doc_id AND m.is_test),
       |rare AS (SELECT sh FROM tsh GROUP BY sh HAVING count(*) <= $maxTestDf),
       |pbits AS (SELECT DISTINCT unnest($posList) AS bit
       |          FROM (SELECT DISTINCT sh FROM tsh JOIN rare USING (sh))),
       |tr AS (SELECT s.doc_id AS train_id, s.sh, unnest($posList) AS bit
       |       FROM sh s JOIN mem m ON m.doc_id = s.doc_id AND NOT m.is_test),
       |cands AS (SELECT train_id, sh FROM tr JOIN pbits USING (bit)
       |          GROUP BY train_id, sh HAVING count(*) = 4),
       |tot AS (SELECT s.doc_id AS train_id, CAST(count(*) AS BIGINT) AS n_shingles
       |        FROM sh s JOIN mem m ON m.doc_id = s.doc_id AND NOT m.is_test
       |        GROUP BY 1)
       |SELECT c.train_id, tot.n_shingles,
       |  CAST(count(*) AS BIGINT) AS n_candidates
       |FROM cands c JOIN tot ON tot.train_id = c.train_id
       |GROUP BY c.train_id, tot.n_shingles
       |HAVING count(*) >= $minOverlap""".stripMargin
  }
}
