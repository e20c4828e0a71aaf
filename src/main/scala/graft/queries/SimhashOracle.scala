package graft.queries

/** Generated DuckDB mirror of [[graft.operators.Dedup.simhashSignature]]:
  * same md5-hex-digit bit votes, same sign rule, same hex reassembly —
  * pure integer/string arithmetic, so the comparison is exact. */
object SimhashOracle {

  val sql: String = sqlFor("documents")

  /** The q45 signature chain over an arbitrary docs relation —
    * `documents` for the standalone oracles, the policy-acted CTE for
    * the q167 capstone. */
  def sqlFor(docsRel: String): String = {
    val digitDefs = (0 until 16).map { k =>
      s"strpos('0123456789abcdef', substr(h, ${k + 1}, 1)) - 1 AS d$k"
    }.mkString(",\n  ")
    val voteDefs = (0 until 16).flatMap { k =>
      (0 until 4).map { b =>
        s"sum(CASE WHEN (d$k // ${1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v${k}_$b"
      }
    }.mkString(",\n  ")
    val digitExprs = (0 until 16).map { k =>
      val v = (0 until 4).map(b => s"(CASE WHEN v${k}_$b >= 0 THEN ${1 << b} ELSE 0 END)").mkString(" + ")
      s"substr('0123456789abcdef', ($v) + 1, 1)"
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, md5(unnest(string_split_regex(lower(text), '\\s+'))) AS h
       |  FROM $docsRel),
       |digits AS (
       |  SELECT doc_id,
       |  $digitDefs
       |  FROM toks),
       |votes AS (
       |  SELECT doc_id,
       |  $voteDefs
       |  FROM digits GROUP BY doc_id)
       |SELECT doc_id, concat($digitExprs) AS simhash FROM votes""".stripMargin
  }

  /** DuckDB mirror of [[graft.operators.Dedup.simhashNearDupPairs]]: the
    * q45 signature CTE → 4×4-hex bands → candidate bucket-join →
    * per-hex-digit xor/bit_count hamming verification — integer/string
    * arithmetic end to end, so the banded pairing oracle-checks exactly
    * like the signatures do. */
  def pairsSql(maxHamming: Int = 5, docsRel: String = "documents"): String = {
    val ham = (0 until 16).map { k =>
      s"bit_count(xor(strpos('0123456789abcdef', substr(x.simhash, ${k + 1}, 1)) - 1, " +
        s"strpos('0123456789abcdef', substr(y.simhash, ${k + 1}, 1)) - 1))"
    }.mkString(" + ")
    s"""WITH sig AS (${sqlFor(docsRel)}),
       |bands AS (SELECT doc_id, b, substr(simhash, 1 + 4*b, 4) AS bh
       |          FROM sig, range(0, 4) t(b)),
       |cand AS (SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
       |         FROM bands a JOIN bands b
       |         ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id, CAST($ham AS BIGINT) AS hamming
       |FROM cand JOIN sig x ON x.doc_id = a_id JOIN sig y ON y.doc_id = b_id
       |WHERE CAST($ham AS BIGINT) <= $maxHamming""".stripMargin
  }
}
