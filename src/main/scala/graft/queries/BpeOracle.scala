package graft.queries

/** Generated DuckDB mirror of [[graft.operators.Phrases.bpeEncode]] —
  * the bounded-merge-count replay: the training loop (argmax pair under
  * the q106 total order over EXPANDED symbols → marker rewrite) unrolls
  * into one CTE block per merge, then the encode pass joins the token
  * stream against the final marker-space vocabulary.
  *
  * Per merge m the chain carries three frames forward:
  *  - `p$m` — the pair sheet of the marker-space words `w${m-1}`, with
  *    symbols EXPANDED through the symbol table `s${m-1}` (marker char →
  *    fused string; raw chars pass through via coalesce) so the
  *    tie-break orders true symbol strings, exactly like the Spark
  *    `expand` mapping;
  *  - `t$m` — the argmax row (pair_count DESC, e1, e2 LIMIT 1), plus the
  *    marker-space representation (r1, r2) of the two symbols via
  *    `min(ch)` reverse lookups (min = first marker, mirroring the
  *    Spark-side first-wins reverse map for expansion collisions);
  *  - `s$m` / `w$m` — the symbol table extended with `chr(m) → e1‖e2`
  *    and the vocabulary rewritten by greedy left-to-right `replace`.
  *    A LEFT JOIN ON TRUE keeps the chain total when the vocab runs out
  *    of pairs (empty `t$m` → words pass through unchanged).
  *
  * The marker contract ([[graft.operators.Phrases.Markers]]) is the
  * same `NOT regexp_matches(w, '[\x01-\x08]')` predicate as the Spark
  * side, applied to both the vocabulary and the encode token stream. */
object BpeOracle {

  def encodeSql(numMerges: Int): String = {
    require(numMerges >= 1 && numMerges <= 8, s"numMerges in [1,8], got $numMerges")
    val merges = (1 to numMerges).map { m =>
      val prev = m - 1
      s"""p$m AS MATERIALIZED (SELECT e1, e2, CAST(sum(cnt) AS BIGINT) AS pc FROM (
         |  SELECT coalesce(sa.ex, q.c1) AS e1, coalesce(sb.ex, q.c2) AS e2, q.cnt
         |  FROM (SELECT substr(w, CAST(i AS INTEGER), 1) AS c1,
         |               substr(w, CAST(i AS INTEGER) + 1, 1) AS c2, cnt
         |        FROM (SELECT w, cnt, unnest(range(1, length(w))) AS i
         |              FROM w$prev WHERE length(w) >= 2)) q
         |  LEFT JOIN s$prev sa ON sa.ch = q.c1
         |  LEFT JOIN s$prev sb ON sb.ch = q.c2
         |) GROUP BY e1, e2),
         |t$m AS MATERIALIZED (SELECT e1, e2,
         |          coalesce((SELECT min(ch) FROM s$prev s WHERE s.ex = e1), e1) AS r1,
         |          coalesce((SELECT min(ch) FROM s$prev s WHERE s.ex = e2), e2) AS r2
         |        FROM p$m ORDER BY pc DESC, e1, e2 LIMIT 1),
         |s$m AS MATERIALIZED (SELECT ch, ex FROM s$prev
         |        UNION ALL SELECT chr($m), e1 || e2 FROM t$m),
         |w$m AS MATERIALIZED (SELECT w0, CASE WHEN t.e1 IS NULL THEN w
         |               ELSE replace(w, t.r1 || t.r2, chr($m)) END AS w, cnt
         |        FROM w$prev LEFT JOIN t$m t ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS MATERIALIZED (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |              FROM documents WHERE text IS NOT NULL),
       |tok AS MATERIALIZED (SELECT doc_id, w FROM (SELECT doc_id, unnest(t) AS w FROM toks)
       |        WHERE NOT regexp_matches(w, '[\\x01-\\x08]')),
       |w0 AS MATERIALIZED (SELECT w AS w0, w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY w),
       |s0(ch, ex) AS (SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) WHERE 1 = 0),
       |$merges,
       |enc AS (SELECT w0, CAST(length(w0) AS BIGINT) AS n_chars,
       |               CAST(length(w) AS BIGINT) AS n_sym FROM w$numMerges),
       |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |               CAST(sum(enc.n_chars) AS BIGINT) AS n_chars,
       |               CAST(sum(enc.n_sym) AS BIGINT) AS n_bpe_tokens
       |        FROM tok JOIN enc ON tok.w = enc.w0 GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(per.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(per.n_chars, 0) AS BIGINT) AS n_chars,
       |  CAST(coalesce(per.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin
  }

  /** q118 mirror of
    * [[graft.operators.Phrases.bpeFertilitySheet]]: the full
    * [[encodeSql]] chain as a subquery, aggregated onto
    * (source, lang) with the two IEEE ratio columns (nullif-guarded
    * like the Spark side). */
  def fertilitySql(numMerges: Int): String =
    s"""SELECT d.source, d.lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(e.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(e.n_chars) AS BIGINT) AS n_chars,
       |  CAST(sum(e.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(e.n_bpe_tokens) AS DOUBLE) / nullif(sum(e.n_words), 0) AS fertility,
       |  CAST(sum(e.n_chars) AS DOUBLE) / nullif(sum(e.n_bpe_tokens), 0) AS compression
       |FROM (
       |${encodeSql(numMerges)}
       |) e JOIN documents d ON d.doc_id = e.doc_id
       |GROUP BY d.source, d.lang""".stripMargin
}
