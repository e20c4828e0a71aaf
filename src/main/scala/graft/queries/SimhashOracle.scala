package graft.queries

/** Generated DuckDB mirror of [[graft.operators.Dedup.simhashSignature]]:
  * same md5-hex-digit bit votes, same sign rule, same hex reassembly —
  * pure integer/string arithmetic, so the comparison is exact. */
object SimhashOracle {

  val sql: String = {
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
       |  FROM documents),
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
}
