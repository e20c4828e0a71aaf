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

  /** q123 mirror of [[graft.operators.Phrases.unigramLmRound]] — the
    * Viterbi hard-EM round replayed with two recursive CTEs:
    *
    *  - `dp` carries one row per distinct (truncated) word per
    *    position, appending (cost, pred, piece) lists as it advances;
    *    the per-position argmin is `list_sort` over candidate structs
    *    ordered (cost, strt, piece) — field order IS the tie-break, so
    *    it matches the Spark window (cost ASC, start ASC) exactly (strt
    *    is unique per candidate; piece never decides);
    *  - `bt` walks the pred pointers down from pos = len, emitting the
    *    chosen piece at every visited position.
    *
    * Costs are the same integer-log surrogate
    * `22 − length(bin(score_q + 1))`; every score is a BIGINT floor
    * division, so the whole round oracles bitwise. */
  def unigramSql(maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512, k: Int = 200): String = {
    val Q = 1048576L
    s"""WITH RECURSIVE
       |${unigramChain(maxPieceLen, maxWordLen, seedSize)},
       |em AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS em_cnt FROM (
       |    SELECT b.cnt, f.pieces[CAST(b.pos AS INTEGER)] AS piece
       |    FROM bt b JOIN dpf f USING (w) WHERE b.pos > 0) GROUP BY piece),
       |pruned AS (SELECT v.piece, v.seed_cnt, coalesce(e.em_cnt, 0) AS em_cnt
       |  FROM vc v LEFT JOIN em e USING (piece)
       |  WHERE length(v.piece) = 1 OR coalesce(e.em_cnt, 0) > 0)
       |SELECT piece, seed_cnt, CAST(em_cnt AS BIGINT) AS em_cnt,
       |  CAST((em_cnt * $Q) // (SELECT sum(em_cnt) FROM pruned) AS BIGINT) AS em_score_q
       |FROM pruned ORDER BY em_cnt DESC, piece LIMIT $k""".stripMargin
  }

  /** q124 mirror of [[graft.operators.Phrases.unigramEncode]]: the
    * same recursive chain, closed by per-word path lengths (`wp` —
    * the count of backtrace-visited positions) joined onto the
    * (doc, truncated word) token stream and rolled up per document.
    * Null-text docs report zeros via the LEFT JOIN. */
  def unigramEncodeSql(maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512): String =
    s"""WITH RECURSIVE
       |${unigramChain(maxPieceLen, maxWordLen, seedSize)},
       |wp AS (SELECT w, CAST(count(*) AS BIGINT) AS np
       |       FROM bt WHERE pos > 0 GROUP BY w),
       |tokd AS (SELECT doc_id, substr(w, 1, $maxWordLen) AS w
       |        FROM (SELECT doc_id, unnest(t) AS w FROM toks) WHERE length(w) >= 1),
       |per AS (SELECT td.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |          CAST(sum(length(td.w)) AS BIGINT) AS n_chars,
       |          CAST(sum(wp.np) AS BIGINT) AS n_pieces
       |        FROM tokd td JOIN wp USING (w) GROUP BY td.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(per.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(per.n_chars, 0) AS BIGINT) AS n_chars,
       |  CAST(coalesce(per.n_pieces, 0) AS BIGINT) AS n_pieces
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin

  /** q125 mirror of [[graft.operators.Phrases.lmQualityBuckets]]: the
    * shared recursive chain, per-word (path length, final DP cost)
    * sheets, per-doc sums over the (doc, word) stream, the quantized
    * per-piece perplexity, exact discrete 33 %/67 % cuts
    * (percentile_disc — the q60-pinned selection semantics), and the
    * CASE bucketing. The empty-corpus degenerate mirrors the Spark
    * side: an all-NULL cuts row buckets everything 'empty' via the
    * first branch. */
  def unigramQualitySql(maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512): String =
    s"""WITH RECURSIVE
       |${unigramChain(maxPieceLen, maxWordLen, seedSize)},
       |wpc AS (SELECT w, CAST(count(*) AS BIGINT) AS np
       |        FROM bt WHERE pos > 0 GROUP BY w),
       |wcost AS (SELECT w, costs[CAST(len AS INTEGER) + 1] AS wcost FROM dpf),
       |tokd AS (SELECT doc_id, substr(w, 1, $maxWordLen) AS w
       |        FROM (SELECT doc_id, unnest(t) AS w FROM toks) WHERE length(w) >= 1),
       |per AS (SELECT td.doc_id, CAST(sum(wpc.np) AS BIGINT) AS n_pieces,
       |          CAST(sum(wcost.wcost) AS BIGINT) AS cost_q
       |        FROM tokd td JOIN wpc USING (w) JOIN wcost USING (w)
       |        GROUP BY td.doc_id),
       |scored AS (SELECT d.doc_id,
       |    CAST(coalesce(per.n_pieces, 0) AS BIGINT) AS n_pieces,
       |    CAST(coalesce(per.cost_q, 0) AS BIGINT) AS cost_q,
       |    CASE WHEN coalesce(per.n_pieces, 0) > 0
       |      THEN CAST((per.cost_q * 1048576) // per.n_pieces AS BIGINT)
       |      ELSE 0 END AS ppl_q
       |  FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id),
       |cuts AS (SELECT
       |    percentile_disc(0.33) WITHIN GROUP (ORDER BY ppl_q) AS p33,
       |    percentile_disc(0.67) WITHIN GROUP (ORDER BY ppl_q) AS p67
       |  FROM scored WHERE n_pieces > 0)
       |SELECT s.doc_id, s.n_pieces, s.cost_q, s.ppl_q,
       |  CASE WHEN s.n_pieces = 0 THEN 'empty'
       |       WHEN s.ppl_q <= c.p33 THEN 'head'
       |       WHEN s.ppl_q <= c.p67 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM scored s, cuts c""".stripMargin

  /** q194 mirror of
    * [[graft.operators.Phrases.lmQualityBucketsByLang]]: the
    * [[LangIdOracle.applySql]] act embedded as the `mint` derived
    * table, then the WHOLE [[unigramChain]] replayed with every
    * census / vocabulary / DP / backtrace key widened to
    * (lang_id, ·) — per-lang word counts, the top-`seedSize`
    * multi-char pieces ranked WITHIN each language (row_number over
    * (seed_cnt DESC, piece), the global LIMIT made per-group), the
    * per-lang score normalizer as a window over the lang partition,
    * per-(lang, word) DP recursion joining its own language's vocab —
    * closed by per-(doc, lang) sums, per-LANGUAGE exact discrete
    * 33 %/67 % cuts (percentile_disc GROUP BY lang_id ≡ the grouped
    * radix kernel, the q60 pin lifted to groups) and the q125 CASE. */
  def unigramQualityByLangSql(marginThresholdQ: Long = 5000L,
      maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512): String = {
    val Q = 1048576L
    val cands = (1 to maxPieceLen).map { l =>
      val guard = if (l == 1) "" else s"d.pos >= ${l - 1} AND "
      s"""CASE WHEN ${guard}v$l.piece IS NOT NULL THEN
         |  {'cost': d.costs[d.pos + ${2 - l}] + v$l.piece_cost,
         |   'strt': CAST(d.pos + ${1 - l} AS BIGINT), 'piece': v$l.piece} END""".stripMargin
    }.mkString(",\n")
    val joins = (1 to maxPieceLen).map { l =>
      val guard = if (l == 1) "" else s"d.pos >= ${l - 1} AND "
      s"LEFT JOIN lvc v$l ON ${guard}v$l.lang_id = d.lang_id " +
        s"AND v$l.piece = substr(d.w, d.pos + ${2 - l}, $l)"
    }.mkString("\n")
    s"""WITH RECURSIVE
       |mint AS MATERIALIZED (SELECT doc_id, lang_id FROM (
       |${LangIdOracle.applySql(marginThresholdQ)}
       |) am),
       |ldocs AS MATERIALIZED (SELECT d.doc_id, m.lang_id, d.text
       |  FROM documents d JOIN mint m ON m.doc_id = d.doc_id),
       |ltoks AS MATERIALIZED (SELECT doc_id, lang_id,
       |    string_split_regex(lower(text), '\\s+') AS t
       |  FROM ldocs WHERE text IS NOT NULL),
       |lwords AS MATERIALIZED (SELECT lang_id, substr(w, 1, $maxWordLen) AS w,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT lang_id, unnest(t) AS w FROM ltoks)
       |  WHERE length(w) >= 1 GROUP BY 1, 2),
       |locc AS (SELECT lang_id, piece, CAST(sum(cnt) AS BIGINT) AS seed_cnt FROM (
       |    SELECT lang_id, cnt, unnest(flatten(list_transform(range(1, length(w) + 1),
       |      i -> list_transform(
       |        range(1, least($maxPieceLen, length(w) - CAST(i AS INTEGER) + 1) + 1),
       |        l -> substr(w, CAST(i AS INTEGER), CAST(l AS INTEGER)))))) AS piece
       |    FROM lwords) GROUP BY 1, 2),
       |lvocab0 AS (SELECT lang_id, piece, seed_cnt FROM locc WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT lang_id, piece, seed_cnt FROM (
       |    SELECT lang_id, piece, seed_cnt, row_number() OVER (
       |        PARTITION BY lang_id ORDER BY seed_cnt DESC, piece) AS rnk
       |    FROM locc WHERE length(piece) >= 2) WHERE rnk <= $seedSize),
       |lvc AS MATERIALIZED (SELECT lang_id, piece, seed_cnt,
       |    CAST((seed_cnt * $Q) // (sum(seed_cnt) OVER (PARTITION BY lang_id)) AS BIGINT) AS score_q,
       |    22 - length(bin(CAST((seed_cnt * $Q) // (sum(seed_cnt) OVER (PARTITION BY lang_id))
       |      AS BIGINT) + 1)) AS piece_cost
       |  FROM lvocab0),
       |ldp AS (
       |  SELECT lang_id, w, cnt, length(w) AS len, 0 AS pos,
       |    [CAST(0 AS BIGINT)] AS costs,
       |    CAST([] AS BIGINT[]) AS preds, CAST([] AS VARCHAR[]) AS pieces
       |  FROM lwords
       |  UNION ALL
       |  SELECT lang_id, w, cnt, len, pos,
       |    list_append(costs, best.cost), list_append(preds, best.strt),
       |    list_append(pieces, best.piece)
       |  FROM (
       |    SELECT d.lang_id, d.w, d.cnt, d.len, d.pos + 1 AS pos,
       |      d.costs, d.preds, d.pieces,
       |      (list_sort(list_filter([
       |$cands
       |      ], x -> x.piece IS NOT NULL)))[1] AS best
       |    FROM ldp d
       |$joins
       |    WHERE d.pos < d.len)),
       |ldpf AS MATERIALIZED (SELECT lang_id, w, cnt, len, costs, preds, pieces
       |  FROM ldp WHERE pos = len),
       |lbt AS (
       |  SELECT lang_id, w, cnt, CAST(len AS BIGINT) AS pos FROM ldpf
       |  UNION ALL
       |  SELECT b.lang_id, b.w, b.cnt, f.preds[CAST(b.pos AS INTEGER)]
       |  FROM lbt b JOIN ldpf f USING (lang_id, w) WHERE b.pos > 0),
       |lwpc AS (SELECT lang_id, w, CAST(count(*) AS BIGINT) AS np
       |  FROM lbt WHERE pos > 0 GROUP BY 1, 2),
       |lwcost AS (SELECT lang_id, w, costs[CAST(len AS INTEGER) + 1] AS wcost
       |  FROM ldpf),
       |ltokd AS (SELECT doc_id, lang_id, substr(w, 1, $maxWordLen) AS w
       |  FROM (SELECT doc_id, lang_id, unnest(t) AS w FROM ltoks)
       |  WHERE length(w) >= 1),
       |lper AS (SELECT td.doc_id, td.lang_id,
       |    CAST(sum(lwpc.np) AS BIGINT) AS n_pieces,
       |    CAST(sum(lwcost.wcost) AS BIGINT) AS cost_q
       |  FROM ltokd td JOIN lwpc USING (lang_id, w) JOIN lwcost USING (lang_id, w)
       |  GROUP BY 1, 2),
       |lscored AS (SELECT l.doc_id, l.lang_id,
       |    CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces,
       |    CAST(coalesce(p.cost_q, 0) AS BIGINT) AS cost_q,
       |    CASE WHEN coalesce(p.n_pieces, 0) > 0
       |      THEN CAST((p.cost_q * $Q) // p.n_pieces AS BIGINT)
       |      ELSE 0 END AS ppl_q
       |  FROM ldocs l LEFT JOIN lper p
       |    ON p.doc_id = l.doc_id AND p.lang_id = l.lang_id),
       |lcuts AS (SELECT lang_id,
       |    percentile_disc(0.33) WITHIN GROUP (ORDER BY ppl_q) AS p33,
       |    percentile_disc(0.67) WITHIN GROUP (ORDER BY ppl_q) AS p67
       |  FROM lscored WHERE n_pieces > 0 GROUP BY 1)
       |SELECT s.doc_id, s.lang_id, s.n_pieces, s.cost_q, s.ppl_q,
       |  CASE WHEN s.n_pieces = 0 THEN 'empty'
       |       WHEN s.ppl_q <= c.p33 THEN 'head'
       |       WHEN s.ppl_q <= c.p67 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM lscored s LEFT JOIN lcuts c USING (lang_id)""".stripMargin
  }

  /** The shared unigram CTE chain (toks → words → seed/vocab `vc` →
    * recursive DP `dp`/`dpf` → backtrace `bt`) both unigram oracles
    * close over. See [[unigramSql]]'s scaladoc for the argmin
    * tie-break contract. */
  private def unigramChain(maxPieceLen: Int, maxWordLen: Int,
      seedSize: Int): String = {
    val Q = 1048576L
    // candidate struct for piece length l ending at position d.pos+1:
    // prev position = d.pos+1-l, costs list index = prev+1, substring
    // start = prev+1 (1-based)
    val cands = (1 to maxPieceLen).map { l =>
      val guard = if (l == 1) "" else s"d.pos >= ${l - 1} AND "
      s"""CASE WHEN ${guard}v$l.piece IS NOT NULL THEN
         |  {'cost': d.costs[d.pos + ${2 - l}] + v$l.piece_cost,
         |   'strt': CAST(d.pos + ${1 - l} AS BIGINT), 'piece': v$l.piece} END""".stripMargin
    }.mkString(",\n")
    val joins = (1 to maxPieceLen).map { l =>
      val guard = if (l == 1) "" else s"d.pos >= ${l - 1} AND "
      s"LEFT JOIN vc v$l ON ${guard}v$l.piece = substr(d.w, d.pos + ${2 - l}, $l)"
    }.mkString("\n")
    s"""toks AS MATERIALIZED (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |        FROM documents WHERE text IS NOT NULL),
       |words AS MATERIALIZED (SELECT substr(w, 1, $maxWordLen) AS w,
       |          CAST(count(*) AS BIGINT) AS cnt
       |        FROM (SELECT unnest(t) AS w FROM toks) WHERE length(w) >= 1 GROUP BY 1),
       |occ AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS seed_cnt FROM (
       |    SELECT cnt, unnest(flatten(list_transform(range(1, length(w) + 1),
       |      i -> list_transform(
       |        range(1, least($maxPieceLen, length(w) - CAST(i AS INTEGER) + 1) + 1),
       |        l -> substr(w, CAST(i AS INTEGER), CAST(l AS INTEGER)))))) AS piece
       |    FROM words) GROUP BY piece),
       |vocab0 AS (SELECT piece, seed_cnt FROM occ WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, seed_cnt FROM (
       |    SELECT piece, seed_cnt FROM occ WHERE length(piece) >= 2
       |    ORDER BY seed_cnt DESC, piece LIMIT $seedSize)),
       |vc AS MATERIALIZED (SELECT piece, seed_cnt,
       |    CAST((seed_cnt * $Q) // (SELECT sum(seed_cnt) FROM vocab0) AS BIGINT) AS score_q,
       |    22 - length(bin(CAST((seed_cnt * $Q) // (SELECT sum(seed_cnt) FROM vocab0)
       |      AS BIGINT) + 1)) AS piece_cost
       |  FROM vocab0),
       |dp AS (
       |  SELECT w, cnt, length(w) AS len, 0 AS pos,
       |    [CAST(0 AS BIGINT)] AS costs,
       |    CAST([] AS BIGINT[]) AS preds, CAST([] AS VARCHAR[]) AS pieces
       |  FROM words
       |  UNION ALL
       |  SELECT w, cnt, len, pos,
       |    list_append(costs, best.cost), list_append(preds, best.strt),
       |    list_append(pieces, best.piece)
       |  FROM (
       |    SELECT d.w, d.cnt, d.len, d.pos + 1 AS pos, d.costs, d.preds, d.pieces,
       |      (list_sort(list_filter([
       |$cands
       |      ], x -> x.piece IS NOT NULL)))[1] AS best
       |    FROM dp d
       |$joins
       |    WHERE d.pos < d.len)),
       |dpf AS MATERIALIZED (SELECT w, cnt, len, costs, preds, pieces FROM dp WHERE pos = len),
       |bt AS (
       |  SELECT w, cnt, CAST(len AS BIGINT) AS pos FROM dpf
       |  UNION ALL
       |  SELECT b.w, b.cnt, f.preds[CAST(b.pos AS INTEGER)]
       |  FROM bt b JOIN dpf f USING (w) WHERE b.pos > 0)""".stripMargin
  }

  /** q118 mirror of
    * [[graft.operators.Phrases.bpeFertilitySheet]]: the full
    * [[encodeSql]] chain as a subquery, aggregated onto
    * (source, lang) with the two IEEE ratio columns (nullif-guarded
    * like the Spark side). */
  /** q137 mirror of [[graft.operators.Phrases.bigramLmQuality]]:
    * truncated token arrays → (doc, w1, w2) occurrence collapse →
    * add-1-smoothed bigram costs `log2q(c1 + V) − log2q(c2 + 1)` via
    * the shared six-round chain ([[DsirOracle.logChain]], keyed by
    * context word resp. bigram) → per-doc BIGINT sums → the q125
    * percentile_disc closing. */
  def bigramLmQualitySql(maxWordLen: Int = 12): String = {
    val Q = 1048576L
    s"""WITH toksb AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_filter(list_transform(string_split_regex(lower(text), '\\s+'),
       |      t -> substring(t, 1, $maxWordLen)), w -> length(w) >= 1) AS tk
       |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       |prs AS MATERIALIZED (
       |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS occ FROM (
       |    SELECT doc_id, tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2
       |    FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
       |          FROM toksb WHERE len(tk) >= 2))
       |  GROUP BY 1, 2, 3),
       |bg AS (SELECT w1, w2, CAST(sum(occ) AS BIGINT) AS c2
       |       FROM prs GROUP BY 1, 2),
       |ug AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bg GROUP BY 1),
       |vq AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
       |       FROM (SELECT unnest(tk) AS w FROM toksb)),
       |${DsirOracle.logChain("ug, vq", Seq("a" -> "c1 + v"),
           keyCols = Seq("w1"), prefix = "ca")},
       |${DsirOracle.logChain("bg", Seq("b" -> "c2 + 1"),
           keyCols = Seq("w1", "w2"), prefix = "cb")},
       |sheet AS (
       |  SELECT cb6.w1, cb6.w2,
       |    (ca6.e_a * 64 + ca6.f_a) - (cb6.e_b * 64 + cb6.f_b) AS bcost_q
       |  FROM cb6 JOIN ca6 USING (w1)),
       |per AS (
       |  SELECT p.doc_id, CAST(sum(p.occ) AS BIGINT) AS n_bigrams,
       |         CAST(sum(p.occ * s.bcost_q) AS BIGINT) AS cost_q
       |  FROM prs p JOIN sheet s ON s.w1 = p.w1 AND s.w2 = p.w2
       |  GROUP BY p.doc_id),
       |scored AS (
       |  SELECT d.doc_id,
       |    CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |    CAST(coalesce(per.cost_q, 0) AS BIGINT) AS cost_q,
       |    CASE WHEN coalesce(per.n_bigrams, 0) > 0
       |      THEN CAST((per.cost_q * $Q) // per.n_bigrams AS BIGINT)
       |      ELSE 0 END AS ppl_q
       |  FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id),
       |cuts AS (SELECT
       |    percentile_disc(0.33) WITHIN GROUP (ORDER BY ppl_q) AS p33,
       |    percentile_disc(0.67) WITHIN GROUP (ORDER BY ppl_q) AS p67
       |  FROM scored WHERE n_bigrams > 0)
       |SELECT s.doc_id, s.n_bigrams, s.cost_q, s.ppl_q,
       |  CASE WHEN s.n_bigrams = 0 THEN 'empty'
       |       WHEN s.ppl_q <= c.p33 THEN 'head'
       |       WHEN s.ppl_q <= c.p67 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM scored s, cuts c""".stripMargin
  }

  /** q136 mirror of [[graft.operators.Phrases.oovAudit]]: standing
    * single-character census (the q55 md5-bucket split, standing =
    * NOT new), per-(doc, word) occurrence collapse on the batch side,
    * a word is OOV iff any of its characters misses the census —
    * all-BIGINT counts and the 1000·x DIV y rate, bitwise. */
  def oovAuditSql(newPermille: Int = 100, maxWordLen: Int = 12,
      salt: String = "graft"): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt)
    s"""WITH mem AS (SELECT doc_id, (($bucket) % 1000 < $newPermille) AS is_new
       |  FROM documents WHERE doc_id IS NOT NULL),
       |words AS (
       |  SELECT w.doc_id, m.is_new, substring(w.t, 1, $maxWordLen) AS w
       |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS t
       |        FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL) w
       |  JOIN mem m USING (doc_id)
       |  WHERE len(w.t) >= 1),
       |vocab AS (
       |  SELECT DISTINCT substring(w, CAST(i AS INT), 1) AS c FROM (
       |    SELECT w, unnest(range(1, len(w) + 1)) AS i
       |    FROM words WHERE NOT is_new)),
       |nw AS (
       |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS occ
       |  FROM words WHERE is_new GROUP BY 1, 2),
       |wf AS (
       |  SELECT n.doc_id, n.w, n.occ,
       |    max(CASE WHEN v.c IS NULL THEN 1 ELSE 0 END) AS is_oov
       |  FROM (SELECT doc_id, w, occ, substring(w, CAST(i AS INT), 1) AS c FROM (
       |          SELECT doc_id, w, occ, unnest(range(1, len(w) + 1)) AS i
       |          FROM nw)) n
       |  LEFT JOIN vocab v USING (c)
       |  GROUP BY 1, 2, 3),
       |per AS (
       |  SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_words,
       |         CAST(sum(occ * is_oov) AS BIGINT) AS n_oov_words
       |  FROM wf GROUP BY 1)
       |SELECT m.doc_id,
       |  CAST(coalesce(per.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(per.n_oov_words, 0) AS BIGINT) AS n_oov_words,
       |  CAST(CASE WHEN coalesce(per.n_words, 0) > 0
       |    THEN (1000 * per.n_oov_words) // per.n_words ELSE 0 END AS BIGINT)
       |    AS oov_permille
       |FROM mem m LEFT JOIN per ON per.doc_id = m.doc_id
       |WHERE m.is_new""".stripMargin
  }

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
