package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram collocation (phrase) detection — the word2phrase step of a
  * training-data pipeline (Mikolov et al. 2013, public): score every
  * adjacent token pair by how much more often it occurs than its
  * unigrams predict, and flag pairs whose lift clears a threshold as
  * multi-word phrases worth fusing into single tokens before BPE
  * training or n-gram feature extraction.
  *
  * Determinism design (the QuerySpec contract): the whole sheet is
  * BIGINT arithmetic — `lift_q = ((pair_cnt − δ) · 2^20 · N) div
  * (cnt1 · cnt2)` is one integer floor division, and the phrase test
  * `(pair_cnt − δ) · N > (num/den) · cnt1 · cnt2` is cross-multiplied
  * — so every column oracles bitwise (the q83/q90 idiom; a
  * floating-point PMI would need `ln`, which diverges across libm —
  * the q51/q84 precedent). Overflow headroom: the numerator is
  * ≤ pair_cnt·N·2^20; at 2^63 that bounds pair_cnt·N < 2^43 — fine for
  * per-partition-of-corpus vocab sheets; shard the corpus before the
  * sheet if pair_cnt·N approaches that.
  *
  * Scale shape: adjacent pairs assemble MAP-SIDE (`slice`+`arrays_zip`
  * on the token array — no window over the token stream, the q28
  * shingle lesson), then collapse in a map-side-combined (w1, w2)
  * count before the one hash exchange; unigram counts are the same
  * shape keyed on term, with corpus total N attached by an
  * unpartitioned window over the vocab-sized frame (the q89 idiom —
  * no second corpus scan for the total). The closing joins are
  * vocab-level (bigram sheet × unigram counts twice) — never corpus
  * rows. Two corpus scans total (pair branch + unigram branch):
  * genuinely different aggregation keys, each collapsing map-side, so
  * the cross-cluster movement is vocab-sized on both branches. The
  * unigram frame is [[Dedup.materialize]]d because it joins twice —
  * un-materialized, Spark re-plans its subtree per consumer and the
  * corpus is scanned three times (ScaleSpec pins the count at two).
  */
object Phrases {

  private val Q = 1048576L // 2^20 ratio quantizer

  /** The BPE merge-marker alphabet: merge m is stood for by `chr(m)`
    * during in-vocab rewriting (U+0001…U+0008) and mapped back to its
    * fused string in every output. Corpus words containing any of
    * these characters are excluded from the vocabulary up front
    * ([[wordCounts]] and the oracles' `wc`/`tok` CTEs carry the same
    * predicate) — the enforced marker contract. */
  val Markers: IndexedSeq[Char] = (1 to 8).map(_.toChar)

  /** One row per adjacent bigram with `pair_cnt ≥ minCount`:
    * `(w1, w2, pair_cnt, cnt1, cnt2, lift_q, is_phrase)`. `discount`
    * is word2phrase's δ (penalizes rare pairs); `num/den` the lift
    * threshold (2/1 = fire at 2× the independence rate). Null text
    * contributes nothing (the q81 totality convention: dropped before
    * tokenization, not errored). */
  def bigramLift(docs: DataFrame, textCol: String, minCount: Int = 3,
      discount: Int = 1, num: Long = 2L, den: Long = 1L): DataFrame = {
    require(minCount > discount,
      s"minCount ($minCount) must exceed discount ($discount) so scores stay positive")
    require(num > 0 && den > 0, s"threshold num/den must be positive, got $num/$den")

    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val texts = docs.filter(col(textCol).isNotNull)

    // Adjacent pairs map-side: zip the array against itself shifted by
    // one. slice() is 1-based; greatest(...,0) keeps 0/1-token docs empty.
    val pairs = texts.select(explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minCount)

    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    // Materialized ([[Dedup.materialize]]): the unigram frame joins the
    // bigram sheet TWICE (w1 and w2), and Spark plans the un-shared
    // subtree per consumer — without this, the corpus is scanned three
    // times. The frame is vocab-sized, so the checkpoint is cheap.
    val uni = Dedup.materialize(texts.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .withColumn("n_total", sum(col("cnt")).over(whole)))

    pairs
      .join(uni.select(col("term").as("w1"), col("cnt").as("cnt1"), col("n_total")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("cnt").as("cnt2")), Seq("w2"))
      .select(col("w1"), col("w2"), col("pair_cnt"), col("cnt1"), col("cnt2"),
        expr(s"CAST(((pair_cnt - $discount) * $Q * n_total) DIV (cnt1 * cnt2) AS BIGINT)")
          .as("lift_q"),
        when((col("pair_cnt") - discount) * col("n_total") * den >
            col("cnt1") * col("cnt2") * num, lit(1L)).otherwise(lit(0L))
          .as("is_phrase"))
  }

  /** BPE pair statistics — the distributed step of byte-pair-encoding
    * tokenizer training (Sennrich et al. 2016, public): the
    * frequency-weighted count of every adjacent symbol pair inside
    * words, whose argmax is the merge BPE performs each iteration.
    * Output: the top `k` rows of `(c1, c2, pair_count)` by
    * (pair_count DESC, c1, c2) — a total order, since (c1, c2) is the
    * group key — with `pair_count = Σ word_freq` over occurrences.
    * Lower-cased whitespace tokens ([[graft.functions.TextFunctions
    * .tokens]], the q91 vocab convention); single-char words carry no
    * pair and are excluded; null text contributes nothing.
    *
    * The architecture point (why only the PAIR SHEET is the
    * distributed op): BPE training is corpus-scale exactly once — the
    * word-frequency aggregation. Every subsequent merge iteration
    * rewrites the VOCAB (thousands of types, not billions of tokens),
    * which is single-node work by construction — sentencepiece and
    * the HF trainers do precisely this split — so the engine's job is
    * the one corpus collapse and the first pair table it implies;
    * iterating merges belongs to the vocab-local consumer.
    *
    * Scale shape: ONE corpus scan, collapsing map-side onto vocab
    * keys (the word-count agg combines before its single exchange);
    * the char-pair explode and pair aggregation run entirely on the
    * vocab-sized frame (per-row work ∝ word length), and the closing
    * top-k is TakeOrdered over a ≤ |alphabet|² sheet — corpus rows
    * never move after the first combine. */
  def bpePairStats(docs: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    pairSheet(wordCounts(docs, textCol), identity)
      .orderBy(col("pair_count").desc, col("c1"), col("c2"))
      .limit(k)
  }

  /** Lower-cased whitespace word-frequency frame `(w, cnt)`, words of
    * length ≥ 2 — the ONE corpus collapse both BPE steps share (a real
    * trainer keeps this frame as standing state across merges).
    *
    * Words containing the marker-range control characters
    * U+0001–U+0008 (the BPE merge-marker alphabet, [[Markers]]) are
    * EXCLUDED — the enforced form of the marker contract: an
    * unfiltered marker-carrying word would diverge between engines
    * (see [[bpeMergeDelta]]), so out-of-contract input is dropped
    * identically on both sides (the oracles' `wc` CTEs carry the same
    * `NOT regexp_matches(w, '[\x01-\x08]')` predicate) instead of
    * corrupting the sheet. */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2 && !col("w").rlike("[\\x01-\\x08]"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Frequency-weighted adjacent-symbol pair sheet of a `(w, cnt)`
    * word frame: `(c1, c2, pair_count = Σ cnt)`. `sym` maps each raw
    * one-char symbol for output (identity for the plain char sheet;
    * the merge-delta path maps its marker char back to the fused
    * pair). Entirely vocab-local — per-row work ∝ word length, then
    * one map-side-combined agg on the ≤ |alphabet|² key. */
  private def pairSheet(words: DataFrame, sym: Column => Column): DataFrame =
    words.filter(length(col("w")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => struct(sym(col("w").substr(i, lit(1))).as("c1"),
          sym(col("w").substr(i + lit(1), lit(1))).as("c2")))).as("p"))
      .select(col("p.c1").as("c1"), col("p.c2").as("c2"), col("cnt"))
      .groupBy(col("c1"), col("c2")).agg(sum(col("cnt")).as("pair_count"))

  /** BPE merge-step delta — the incremental twin of [[bpePairStats]]
    * (the q105/q68/q82 incremental-family pattern applied to tokenizer
    * training): perform the ONE merge BPE would do next — fuse the
    * argmax pair (a, b) — and produce the post-merge pair sheet by
    * DELTA, touching only the words that actually contain the fused
    * pair, instead of re-pairing the whole vocabulary.
    *
    * Algorithm: standing sheet P0 = [[pairSheet]] over all words; the
    * merge pair is the P0 argmax under the q106 total order
    * (pair_count DESC, c1, c2 — a one-row vocab-level collect, the
    * same boundary every BPE trainer crosses per merge); affected
    * words are `w CONTAINS a||b` (single-char symbols, so substring
    * adjacency IS pair adjacency); each affected word is rewritten by
    * greedy left-to-right non-overlapping replacement (`replace` —
    * exactly BPE's merge scan) with a one-char marker standing for
    * the fused symbol; the delta is (new pairs of rewritten words) −
    * (old pairs of the same words), and P1 = P0 + delta with zero
    * rows dropped. P1 is bitwise-equal to a monolithic re-pairing of
    * the merged symbolization — the DuckDB oracle computes exactly
    * that recount, so the q109 hash match IS the equivalence proof.
    *
    * Marker contract — ENFORCED, not assumed: a corpus word already
    * containing U+0001 would diverge between engines (the monolithic
    * oracle recount maps EVERY chr(1) occurrence to the fused symbol,
    * while the delta path re-pairs only pair-containing words and
    * leaves unaffected words' natural U+0001 as a raw symbol — an
    * oracle hash MISMATCH, not cosmetic label drift), so
    * [[wordCounts]] excludes marker-range words up front and the
    * oracle's `wc` CTE carries the identical predicate; both engines
    * therefore agree bitwise on any input.
    *
    * Scale shape (100 TB): the corpus is scanned ONCE (the word-count
    * collapse, map-side combined — standing state in a real trainer);
    * P0, the affected subset, the rewrite, and the delta join are all
    * vocab-sized or smaller; the closing full-outer joins are
    * ≤ |alphabet|²-keyed. Nothing corpus-sized moves after the first
    * combine — the property that makes per-merge iteration affordable
    * at all. */
  def bpeMergeDelta(docs: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val wc = Dedup.materialize(wordCounts(docs, textCol))
    val p0 = Dedup.materialize(pairSheet(wc, identity))
    val topRows = p0.orderBy(col("pair_count").desc, col("c1"), col("c2"))
      .limit(1).collect()
    if (topRows.isEmpty) return p0 // empty corpus: nothing to merge
    val ab = topRows(0).getString(0) + topRows(0).getString(1)
    val marker = "\u0001"
    val affected = wc.filter(col("w").contains(ab))
    val rewritten = affected.select(
      call_function("replace", col("w"), lit(ab), lit(marker)).as("w"), col("cnt"))
    val added = pairSheet(rewritten,
        c => when(c === lit(marker), lit(ab)).otherwise(c))
      .withColumnRenamed("pair_count", "add_cnt")
    val removed = pairSheet(affected, identity)
      .withColumnRenamed("pair_count", "sub_cnt")
    val delta = added.join(removed, Seq("c1", "c2"), "full_outer")
      .select(col("c1"), col("c2"),
        (coalesce(col("add_cnt"), lit(0L)) - coalesce(col("sub_cnt"), lit(0L))).as("d"))
    p0.join(delta, Seq("c1", "c2"), "full_outer")
      .select(col("c1"), col("c2"),
        (coalesce(col("pair_count"), lit(0L)) + coalesce(col("d"), lit(0L))).as("pair_count"))
      .filter(col("pair_count") > 0L)
      .orderBy(col("pair_count").desc, col("c1"), col("c2"))
      .limit(k)
  }

  /** BPE apply/encode — the missing third of the tokenizer family,
    * closing train (q106) → incremental update (q109) → APPLY: learn
    * `numMerges` merges by replaying the merge step (each iteration
    * fuses the current argmax pair under the q106 total order —
    * pair_count DESC, then the EXPANDED symbol strings ascending) and
    * encode every document with the learned table, reporting per-doc
    * `(doc_id, n_words, n_chars, n_bpe_tokens)` — the before/after
    * symbol counts a tokenizer-budget planner actually consumes.
    *
    * Encoding semantics: words rewrite by greedy left-to-right
    * non-overlapping replacement in merge-rank order (`replace` —
    * exactly BPE's apply scan, merge 1 first); a word's encoded
    * length is its marker-space character count. The vocabulary here
    * keeps ALL words (1-char words encode as themselves — unlike the
    * ≥ 2 training filter, which the PAIR sheet preserves implicitly:
    * sub-2-symbol words carry no pairs). Marker-range words are
    * excluded from vocab AND token stream on both engines (the
    * [[Markers]] contract). Null-text docs report zeros.
    *
    * Scale shape (100 TB): corpus is scanned exactly TWICE — the
    * vocab collapse (map-side combined, the standing-state frame) and
    * the encode pass. Encoding does NOT join the vocabulary: the
    * learned merge table is ≤ 8 (pattern, marker) literals, so each
    * token's encoded length is the rank-ordered `replace` chain
    * applied DIRECTLY — by construction the same function the vocab
    * rewrite computed, now a per-row codegen'd expression — and the
    * per-doc sums partial-aggregate map-side, so the one doc_id
    * exchange carries per-doc partials, never tokens (an earlier
    * vocab-join formulation let the static planner broadcast the
    * exploded TOKEN STREAM — corpus-sized — instead of the vocab;
    * this shape has nothing to misjudge). Every merge iteration is
    * vocab-local with a one-row argmax collect (the boundary every
    * BPE trainer crosses per merge, bounded by `numMerges` ≤ 8). */
  def bpeEncode(docs: DataFrame, textCol: String, numMerges: Int = 8): DataFrame = {
    require(numMerges >= 1 && numMerges <= Markers.length,
      s"numMerges must be in [1, ${Markers.length}] (the marker alphabet), got $numMerges")
    val markerClass = "[\\x01-\\x08]"
    val texts = docs.filter(col(textCol).isNotNull)
    val vocab0 = texts
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w0"))
      .filter(!col("w0").rlike(markerClass))
      .groupBy(col("w0")).agg(count(lit(1)).as("cnt"))
    // words carries (original word, marker-space rewrite, freq);
    // materialized per iteration so each merge reads the previous
    // checkpoint instead of replaying the whole lineage.
    // (w, cnt) only: the original-word column the ORACLE's CTE chain
    // threads (its encode joins back on w0) is dead weight Spark-side —
    // encoding replays the replace chain per token, never joining the
    // vocab — so checkpointing it per merge would double string bytes
    // written for nothing.
    var words = materializeVocab(vocab0.select(col("w0").as("w"), col("cnt")))
    // marker char -> expanded fused string, and its inverse
    val expandOf = scala.collection.mutable.Map.empty[String, String]
    val markerOf = scala.collection.mutable.Map.empty[String, String]
    // the applied replaces in rank order: (marker-space pattern, marker)
    val mergeChain = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 1
    var exhausted = false
    while (m <= numMerges && !exhausted) {
      // pair sheet with symbols EXPANDED (markers mapped back to their
      // fused strings) so the argmax tie-break orders the true symbols
      val expand: Column => Column = c =>
        expandOf.toSeq.sortBy(_._1).foldLeft(c) { case (acc, (mk, ex)) =>
          when(c === lit(mk), lit(ex)).otherwise(acc)
        }
      val top = pairSheet(words.select(col("w"), col("cnt")), expand)
        .orderBy(col("pair_count").desc, col("c1"), col("c2")).limit(1).collect()
      if (top.isEmpty) exhausted = true // vocab has no pairs left
      else {
        val e1 = top(0).getString(0); val e2 = top(0).getString(1)
        val r1 = markerOf.getOrElse(e1, e1); val r2 = markerOf.getOrElse(e2, e2)
        val mk = Markers(m - 1).toString
        expandOf(mk) = e1 + e2
        // Two merge paths CAN fuse to the same expanded string (e.g.
        // ("a","bc") and ("ab","c") → "abc"); the reverse map keeps the
        // FIRST (lowest) marker — the oracle mirrors with min(ch) — so
        // both engines rewrite the identical representation.
        markerOf.getOrElseUpdate(e1 + e2, mk)
        mergeChain += ((r1 + r2, mk))
        words = materializeVocab(words.select(
          call_function("replace", col("w"), lit(r1 + r2), lit(mk)).as("w"), col("cnt")))
        m += 1
      }
    }
    // Encode by replaying the EXACT replace sequence the vocab rewrite
    // applied, per token, in rank order — the same function, now a
    // per-row codegen'd chain instead of a vocab join (see scaladoc).
    val applyChain: Column => Column = w =>
      mergeChain.foldLeft(w) { case (acc, (pat, mk)) =>
        call_function("replace", acc, lit(pat), lit(mk))
      }
    val perDoc = texts
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w0"))
      .filter(!col("w0").rlike(markerClass))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w0")).cast("long")).as("n_chars"),
        sum(length(applyChain(col("w0"))).cast("long")).as("n_bpe_tokens"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** [[Dedup.materialize]] for the per-merge vocab frames. */
  private def materializeVocab(df: DataFrame): DataFrame = Dedup.materialize(df)

  /** Tokenizer fertility sheet — the corpus-health readout a tokenizer
    * budget planner consumes, composed from [[bpeEncode]]: per
    * (source, lang), document/word/char/BPE-symbol totals plus
    * `fertility` = BPE symbols per word (the number multilingual
    * tokenizer evaluations report per language) and `compression` =
    * chars per BPE symbol. The ratios are two identical BIGINTs under
    * one IEEE division — bitwise on both engines; zero-word groups
    * yield NULL (nullif guard), not engine-specific inf.
    *
    * Scale shape: [[bpeEncode]]'s two audited corpus passes (vocab
    * collapse + encode) plus ONE map-side-combined aggregation onto
    * the small (source, lang) key — the sheet adds no new
    * corpus-sized movement; the doc_id join rides the encode pass's
    * existing per-doc frame. */
  /** One deterministic Viterbi-EM round of a unigram-LM tokenizer
    * (SentencePiece's model family, Kudo 2018, public) — the SECOND
    * tokenizer family beside BPE (q106/q109/q110/q118), sharing the
    * same ONE-corpus-collapse architecture: everything after the word
    * count is vocab-sized.
    *
    * Algorithm (hard-EM, one round):
    *  1. SEED — every substring of length ≤ `maxPieceLen` of the
    *     (truncated to `maxWordLen`) corpus words, frequency-weighted
    *     by occurrence; vocabulary = ALL single chars (coverage
    *     guarantee) + the top `seedSize` multi-char pieces under the
    *     total order (seed_cnt DESC, piece ASC).
    *  2. SCORE — the q89 quantization: score_q = seed_cnt·2^20 DIV
    *     total, and the piece's Viterbi cost is the INTEGER log
    *     `22 − length(bin(score_q + 1))` — floor(log2) read off the
    *     binary string length, exact BIGINT arithmetic on both engines
    *     (a float −log p would need libm `ln`, the q51/q84 divergence;
    *     this is the monotone integer surrogate).
    *  3. E-STEP — per distinct word, the min-total-cost segmentation
    *     by DP over positions (Viterbi), tie-broken (cost ASC, piece
    *     start ASC — longest final piece wins); expected counts =
    *     Σ word_cnt over the chosen path's pieces. Hard-EM: the
    *     argmax segmentation carries the full count, the deterministic
    *     specialization of SentencePiece's forward-backward.
    *  4. M-STEP + PRUNE — re-estimate em_score_q = em_cnt·2^20 DIV
    *     Σ em_cnt, drop multi-char pieces the E-step never used
    *     (singles stay — coverage), emit the top `k` under
    *     (em_cnt DESC, piece ASC).
    *
    * Output: `(piece, seed_cnt, em_cnt, em_score_q)`.
    *
    * Scale shape (100 TB): ONE corpus scan (the word-count collapse,
    * map-side combined — the same standing frame the BPE family
    * keeps); seeding explodes ≤ maxWordLen·maxPieceLen substrings per
    * VOCAB row. The piece-cost table is seedSize+alphabet-bounded —
    * SentencePiece holds exactly this table in memory on every worker
    * — so it collapses into ONE map column (`map_from_entries`, built
    * distributed, never collected) broadcast onto the word frame, and
    * the entire Viterbi DP + backtrace evaluates as a single map-side
    * higher-order-function expression per DISTINCT word: no per-
    * position joins, no iteration state off the executor. (An earlier
    * formulation ran maxWordLen relational DP rounds — vocab-sized
    * frames, but ~2·maxWordLen checkpointed jobs of pure scheduling
    * overhead; measured 34 s → ~3 s at sf0.1.) Corpus rows never move
    * after the first combine — per-round cost is bounded by
    * vocabulary size, not corpus size, the property that makes EM
    * iteration affordable at all. */
  def unigramLmRound(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512, k: Int = 200): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= 1 && seedSize >= 0 && k >= 1,
      s"bad parameters ($maxPieceLen, $maxWordLen, $seedSize, $k)")
    val words = unigramWords(docs, textCol, maxWordLen)
    val vocab = unigramVocab(words, maxPieceLen, seedSize)
    val em = unigramSegmented(words, vocab, maxPieceLen)
      .select(col("cnt"), explode(col("seg")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("em_cnt"))

    // M-step + prune + deterministic top-k
    vocab.select(col("piece"), col("seed_cnt"))
      .join(em, Seq("piece"), "left")
      .withColumn("em_cnt", coalesce(col("em_cnt"), lit(0L)))
      .filter(length(col("piece")) === 1 || col("em_cnt") > 0)
      .withColumn("em_score_q", expr(s"CAST((em_cnt * $Q) DIV sum(em_cnt) OVER " +
        "(ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)"))
      .orderBy(col("em_cnt").desc, col("piece")).limit(k)
      .select(col("piece"), col("seed_cnt"), col("em_cnt"), col("em_score_q"))
  }

  /** Unigram-LM apply/encode — the APPLY member of the second tokenizer
    * family, the q110 analog: segment every (maxWordLen-truncated)
    * corpus word with the SEED-scored unigram vocabulary's min-cost
    * Viterbi path (exactly [[unigramLmRound]]'s E-step segmentation)
    * and report per document `(doc_id, n_words, n_chars, n_pieces)` —
    * the budget sheet the BPE twin emits as q110. Counts are over the
    * truncated forms (the model's domain); null-text docs report
    * zeros.
    *
    * Scale shape (100 TB): the DP runs ONCE PER DISTINCT WORD
    * (vocab-sized, the [[unigramSegmented]] map-side expression); the
    * corpus-sized side collapses map-side onto (doc_id, word) count
    * keys BEFORE touching the DP output, so the word-keyed join moves
    * narrow count rows — never tokens, never text — and AQE picks
    * broadcast vs shuffle from the vocab frame's true size. Per-doc
    * sums combine map-side on the closing doc_id exchange. */
  def unigramEncode(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= 1 && seedSize >= 0,
      s"bad parameters ($maxPieceLen, $maxWordLen, $seedSize)")
    val words = unigramWords(docs, textCol, maxWordLen)
    val wp = unigramSegmented(words, unigramVocab(words, maxPieceLen, seedSize),
        maxPieceLen)
      .select(col("w"), size(col("seg")).cast("long").as("__np"))
    val perDoc = docs.filter(col(textCol).isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w0"))
      .filter(length(col("w0")) >= 1)
      .select(col("doc_id"), substring(col("w0"), 1, maxWordLen).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("__occ"))
      .join(wp, "w")
      .groupBy(col("doc_id")).agg(
        sum(col("__occ")).as("n_words"),
        sum(col("__occ") * length(col("w")).cast("long")).as("n_chars"),
        sum(col("__occ") * col("__np")).as("n_pieces"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  /** CCNet-style LM-perplexity quality buckets (Wenzek et al. 2020 —
    * the public CCNet method: score every document by a language
    * model's perplexity and split the corpus into head/middle/tail
    * thirds, keeping the head as the cleanest training data). The LM
    * is the engine's own unigram piece model ([[unigramVocab]]): a
    * document's score is its total Viterbi cost (the integer −log p
    * surrogate, Σ over word occurrences of the word's min path cost),
    * normalized per piece — `ppl_q = cost_q·2^20 DIV n_pieces` — so
    * long documents aren't penalized for length, exactly CCNet's
    * per-token normalization. Buckets split at the corpus-wide 33 %
    * and 67 % exact discrete percentiles of ppl_q over non-empty
    * docs (the [[Quantiles.multiQuantileDisc]] kernel): ppl ≤ p33 →
    * 'head' (most predictable = cleanest under the corpus's own
    * model), ≤ p67 → 'middle', else 'tail'; empty/null docs bucket
    * 'empty'. Output: `(doc_id, n_pieces, cost_q, ppl_q, bucket)`.
    *
    * All-BIGINT scoring + discrete percentile SELECTION (no
    * interpolation), so the whole sheet oracles bitwise.
    *
    * Scale shape: q124's audited encode shape (DP once per distinct
    * word; narrow (doc, word) count rows to the join; map-side-combined
    * per-doc sums) plus ONE global discrete-percentile pass over
    * 16-byte (doc, ppl) rows — the q40 global-median shape, with
    * approx_percentile as the documented fallback when doc count
    * outgrows a single task's external sort (the q60 precedent); the
    * two cut values then broadcast onto the disposition sheet. */
  def lmQualityBuckets(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512): DataFrame = {
    val scored = lmScored(docs, textCol, maxPieceLen, maxWordLen, seedSize)
    // always ONE row, even over an all-empty corpus (NULL cuts then
    // never match and every doc buckets 'empty' via the first branch);
    // distributed radix select — no single-task sort of the corpus
    val cuts = Quantiles.globalQuantileDisc(
      scored.filter(col("n_pieces") > 0L),
      "ppl_q", Seq("p33" -> 0.33, "p67" -> 0.67),
      materializeInput = false) // the scored frame is already materialized
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_pieces"), col("cost_q"), col("ppl_q"),
        when(col("n_pieces") === 0L, "empty")
          .when(col("ppl_q") <= col("p33"), "head")
          .when(col("ppl_q") <= col("p67"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** PER-LANGUAGE CCNet quality buckets over the MINTED label — what
    * Wenzek et al. 2020 §4.3 actually do, where [[lmQualityBuckets]]
    * is the corpus-global approximation: real CCNet trains a language
    * model PER LANGUAGE and cuts head/middle/tail within each
    * language, because a single global model scores a minority-
    * language document mostly on "is not the majority language" — its
    * perplexity measures language mismatch, not quality, and the
    * whole minority slice lands in 'tail'. Here the label is the
    * engine's own minted `lang_id` ([[LangId.applyLangId]] at the
    * q185-read threshold — the q184 act, not the provenance claim a
    * feed can lie about; abstained docs form their own 'unknown'
    * group and cut against each other), the unigram piece model
    * ([[unigramVocab]]'s arithmetic) trains per minted language, each
    * doc scores under ITS OWN language's model, and the 33 %/67 %
    * ppl_q cuts select per language — discrete, exact, per-group.
    *
    * Output: one row per doc with a non-NULL doc_id (the act's
    * universe — q125 keeps NULL-doc_id rows, the act never labels
    * them) — `(doc_id, lang_id, n_pieces, cost_q, ppl_q, bucket)`.
    * Single-language degeneracy: a corpus whose every doc mints ONE
    * lang reproduces q125's sheet bitwise plus the constant lang_id
    * column (PhrasesSpec pins it — the cap=∞ convention).
    *
    * Scale shape (100 TB): the q184 audited scoring plan once
    * (doc_id-keyed exchanges, broadcast model sheet); the unigram
    * chain's audited shape with every census/DP key widened to
    * (lang, ·) — the DP still runs once per DISTINCT (lang, word),
    * the per-lang piece vocabularies travel as ONE broadcast
    * K-row map frame, and the seed-census rank window partitions the
    * piece CENSUS (distinct-substring-bounded), never corpus rows;
    * the cuts run through the GROUPED radix kernel
    * ([[Quantiles.groupQuantileDisc]]) — per-language exact
    * percentiles in 4 map-side histogram passes with no per-group
    * single-task sort (the corpus/K group shape that outgrows
    * [[Quantiles.multiQuantileDisc]]'s window sort at scale). */
  def lmQualityBucketsByLang(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", marginThresholdQ: Long = 5000L,
      maxPieceLen: Int = 4, maxWordLen: Int = 12, seedSize: Int = 512,
      trainPermille: Int = 500, buckets: Int = 8192,
      salt: String = "graft"): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= 1 && seedSize >= 0,
      s"bad parameters ($maxPieceLen, $maxWordLen, $seedSize)")
    // the minted label feeds the training censuses AND the per-doc
    // stream — materialize the act's sheet once (the q167 rule)
    val mint = Dedup.materialize(
      LangId.applyLangId(docs, textCol, langCol, trainPermille,
          buckets, salt, marginThresholdQ)
        .select(col("doc_id"), col("lang_id")))
    val ldocs = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col(textCol).as("__text"))
      .join(mint, Seq("doc_id"))
    val scored = lmScoredByLang(ldocs, maxPieceLen, maxWordLen, seedSize)
    val cuts = Quantiles.groupQuantileDisc(
      scored.filter(col("n_pieces") > 0L), "lang_id", "ppl_q",
      Seq("p33" -> 0.33, "p67" -> 0.67),
      materializeInput = false) // the scored frame is already materialized
    // LEFT: a language whose every doc is empty has no cuts row — its
    // docs all take the first branch anyway (same CASE both engines)
    scored.join(broadcast(cuts), Seq("lang_id"), "left")
      .select(col("doc_id"), col("lang_id"), col("n_pieces"),
        col("cost_q"), col("ppl_q"),
        when(col("n_pieces") === 0L, "empty")
          .when(col("ppl_q") <= col("p33"), "head")
          .when(col("ppl_q") <= col("p67"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** The per-(doc, lang) scored frame under [[lmQualityBucketsByLang]]
    * — [[lmScored]]'s arithmetic with every census, vocabulary and DP
    * key widened to (lang_id, ·): per-lang word counts, per-lang seed
    * census with the top-`seedSize` multi-char pieces RANKED WITHIN
    * each language ((seed_cnt DESC, piece) — the global orderBy/limit
    * made per-group), per-lang score normalizers (window over the
    * lang partition replacing the global sum), the per-lang cost maps
    * collapsed to ONE broadcastable K-row frame joined on lang_id,
    * and the identical Viterbi DP per distinct (lang, word).
    * Materialized: feeds both the grouped cuts and the disposition. */
  private def lmScoredByLang(ldocs: DataFrame, maxPieceLen: Int,
      maxWordLen: Int, seedSize: Int): DataFrame = {
    val words = Dedup.materialize(
      ldocs.filter(col("__text").isNotNull)
        .select(col("lang_id"),
          explode(graft.functions.TextFunctions.tokens(col("__text"))).as("w0"))
        .filter(length(col("w0")) >= 1)
        .select(col("lang_id"), substring(col("w0"), 1, maxWordLen).as("w"))
        .groupBy(col("lang_id"), col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("len", length(col("w"))))
    val seed = words
      .select(col("lang_id"), col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(1, least($maxPieceLen, length(w) - i + 1)),
           |    l -> substring(w, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("lang_id"), col("piece")).agg(sum(col("cnt")).as("seed_cnt"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang_id"))
      .orderBy(col("seed_cnt").desc, col("piece"))
    val vocab0 = seed.filter(length(col("piece")) === 1).unionByName(
      seed.filter(length(col("piece")) >= 2)
        .withColumn("__r", row_number().over(wRank))
        .filter(col("__r") <= seedSize).drop("__r"))
    val vocab = Dedup.materialize(vocab0
      .withColumn("score_q", expr(s"CAST((seed_cnt * $Q) DIV sum(seed_cnt) OVER " +
        "(PARTITION BY lang_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)"))
      .withColumn("piece_cost", lit(22L) - length(bin(col("score_q") + 1)).cast("long")))
    val cmaps = vocab.groupBy(col("lang_id")).agg(map_from_entries(
      collect_list(struct(col("piece"), col("piece_cost")))).as("cmap"))
    val wp = words.join(broadcast(cmaps), Seq("lang_id"))
      .withColumn("d", expr(dpExprStr(maxPieceLen)))
      .withColumn("seg", expr(btExprStr))
      .withColumn("w_cost", expr("element_at(d.costs, CAST(length(w) AS INT) + 1)"))
      .select(col("lang_id"), col("w"),
        size(col("seg")).cast("long").as("__np"), col("w_cost"))
    val perDoc = ldocs.filter(col("__text").isNotNull)
      .select(col("doc_id"), col("lang_id"),
        explode(graft.functions.TextFunctions.tokens(col("__text"))).as("w0"))
      .filter(length(col("w0")) >= 1)
      .select(col("doc_id"), col("lang_id"),
        substring(col("w0"), 1, maxWordLen).as("w"))
      .groupBy(col("doc_id"), col("lang_id"), col("w"))
      .agg(count(lit(1)).as("__occ"))
      .join(wp, Seq("lang_id", "w"))
      .groupBy(col("doc_id"), col("lang_id")).agg(
        sum(col("__occ") * col("__np")).as("n_pieces"),
        sum(col("__occ") * col("w_cost")).as("cost_q"))
    Dedup.materialize(
      ldocs.select(col("doc_id"), col("lang_id"))
        .join(perDoc, Seq("doc_id", "lang_id"), "left")
        .select(col("doc_id"), col("lang_id"),
          coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
          coalesce(col("cost_q"), lit(0L)).as("cost_q"))
        .withColumn("ppl_q", when(col("n_pieces") > 0L,
          expr(s"CAST((cost_q * $Q) DIV n_pieces AS BIGINT)")).otherwise(lit(0L))))
  }

  /** The per-doc scored frame under [[lmQualityBuckets]]:
    * `(doc_id, n_pieces, cost_q, ppl_q)`, materialized (it feeds both
    * the cut computation and the disposition select). */
  private def lmScored(docs: DataFrame, textCol: String,
      maxPieceLen: Int, maxWordLen: Int, seedSize: Int): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= 1 && seedSize >= 0,
      s"bad parameters ($maxPieceLen, $maxWordLen, $seedSize)")
    val words = unigramWords(docs, textCol, maxWordLen)
    val wp = unigramSegmented(words, unigramVocab(words, maxPieceLen, seedSize),
        maxPieceLen)
      .select(col("w"), size(col("seg")).cast("long").as("__np"), col("w_cost"))
    val perDoc = docs.filter(col(textCol).isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w0"))
      .filter(length(col("w0")) >= 1)
      .select(col("doc_id"), substring(col("w0"), 1, maxWordLen).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("__occ"))
      .join(wp, "w")
      .groupBy(col("doc_id")).agg(
        sum(col("__occ") * col("__np")).as("n_pieces"),
        sum(col("__occ") * col("w_cost")).as("cost_q"))
    Dedup.materialize(
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
          coalesce(col("cost_q"), lit(0L)).as("cost_q"))
        .withColumn("ppl_q", when(col("n_pieces") > 0L,
          expr(s"CAST((cost_q * $Q) DIV n_pieces AS BIGINT)")).otherwise(lit(0L))))
  }

  /** Truncated lower-cased word-frequency frame `(w, cnt, len)` — the
    * ONE corpus collapse the unigram family shares (the [[wordCounts]]
    * analog; materialized: both the seed census and the DP read it). */
  private def unigramWords(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    Dedup.materialize(
      docs.filter(col(textCol).isNotNull)
        .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w0"))
        .filter(length(col("w0")) >= 1)
        .select(substring(col("w0"), 1, maxWordLen).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("len", length(col("w"))))

  /** Seeded, scored unigram piece vocabulary
    * `(piece, seed_cnt, score_q, piece_cost)`: occurrence-weighted
    * substring census (vocab-local explode), ALL single chars + the
    * top `seedSize` multis under (seed_cnt DESC, piece ASC), q89-
    * quantized scores, and the INTEGER log cost
    * `22 − length(bin(score_q + 1))` — floor(log2) read off the binary
    * string, exact BIGINT arithmetic on both engines. */
  private def unigramVocab(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): DataFrame = {
    val seed = words
      .select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(1, least($maxPieceLen, length(w) - i + 1)),
           |    l -> substring(w, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("seed_cnt"))
    val vocab0 = seed.filter(length(col("piece")) === 1).unionByName(
      seed.filter(length(col("piece")) >= 2)
        .orderBy(col("seed_cnt").desc, col("piece")).limit(seedSize))
    Dedup.materialize(vocab0
      .withColumn("score_q", expr(s"CAST((seed_cnt * $Q) DIV sum(seed_cnt) OVER " +
        "(ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)"))
      .withColumn("piece_cost", lit(22L) - length(bin(col("score_q") + 1)).cast("long")))
  }

  /** The word frame plus `seg` — each word's min-cost Viterbi
    * segmentation — computed as ONE map-side expression per distinct
    * word against the broadcast piece-cost map (`map_from_entries`
    * over the vocab, built distributed, never collected; seedSize +
    * alphabet bounded — the table SentencePiece holds in memory on
    * every worker). Candidate for a length-l piece ending at position
    * i: prev cost at index i−l+1, piece = substring(w, i−l+1, l),
    * start = i−l; argmin by array_sort over (cost, strt, piece)
    * structs — field order IS the (cost ASC, start ASC) tie-break.
    * Missing map keys / out-of-range l yield NULL-cost candidates,
    * filtered before the sort; the all-singles vocab guarantees l = 1
    * always survives. The backtrace walks the pred list down from
    * pos = len inside a second fold. */
  private def unigramSegmented(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame =
    words.crossJoin(broadcast(costMapRow(vocab)))
      .withColumn("d", expr(dpExprStr(maxPieceLen)))
      .withColumn("seg", expr(btExprStr))
      // the word's min total cost — the integer −log p surrogate the
      // quality filter (q125) reads; final DP cell = costs[len + 1]
      .withColumn("w_cost", expr("element_at(d.costs, CAST(length(w) AS INT) + 1)"))
      .drop("d", "cmap")

  /** The scored vocabulary collapsed to ONE broadcastable map row
    * (`cmap: map<string, bigint>` piece → Viterbi cost) — built with
    * map_from_entries, never collected; seedSize + alphabet bounded. */
  private def costMapRow(vocab: DataFrame): DataFrame =
    vocab.agg(map_from_entries(
      collect_list(struct(col("piece"), col("piece_cost")))).as("cmap"))

  /** OOV single-character fallback cost. The trained vocabulary always
    * covers every single character OF ITS OWN CORPUS (the all-singles
    * seed), but the streaming gate applies a STANDING model to new
    * ingest data whose characters the standing corpus may never have
    * seen — without a fallback the l = 1 candidate goes NULL there,
    * every candidate filters out, and the DP's `element_at(…, 1)` on
    * an empty array aborts the streaming query. 30 is strictly worse
    * than any in-vocab piece cost (piece_cost = 22 − length(bin(
    * score_q + 1)) ≤ 21), so an OOV character can never out-score a
    * modeled one and OOV-heavy garbage lands in the 'tail' bucket —
    * it cannot fake its way into 'head'. Batch paths never hit this
    * branch (vocab and corpus coincide), so every oracle sheet is
    * unchanged. */
  private[graft] val UnkCost = 30L

  /** The Viterbi DP fold as a SQL expression over a string named `w`
    * and a cost map named `cmap` (both resolved from the enclosing
    * scope — a column or a lambda variable alike). Result struct:
    * (costs, preds, pieces) lists indexed 1 + position. Candidate for
    * a length-l piece ending at position i: prev cost at index i−l+1,
    * piece = substring(w, i−l+1, l), start = i−l; argmin by array_sort
    * over (cost, strt, piece) structs — field order IS the (cost ASC,
    * start ASC) tie-break. Missing map keys / out-of-range l yield
    * NULL-cost candidates, filtered before the sort; the l = 1
    * candidate coalesces missing keys to [[UnkCost]], so it ALWAYS
    * survives — in-vocab via the all-singles seed on the training
    * corpus, as the UNK fallback on out-of-vocabulary ingest — and
    * the fold is total on any input string. */
  private[graft] def dpExprStr(maxPieceLen: Int): String = {
    val cands = (1 to maxPieceLen).map { l =>
      val lookup = s"element_at(cmap, substring(w, i - ${l - 1}, $l))"
      val cost = if (l == 1) s"coalesce($lookup, CAST($UnkCost AS BIGINT))" else lookup
      val core = s"named_struct(" +
        s"'cost', element_at(acc.costs, i - ${l - 1}) + $cost, " +
        s"'strt', CAST(i - $l AS BIGINT), " +
        s"'piece', substring(w, i - ${l - 1}, $l))"
      if (l == 1) core else s"IF(i >= $l, $core, NULL)"
    }.mkString(",\n        ")
    s"""aggregate(sequence(1, length(w)),
       |  named_struct('costs', array(CAST(0 AS BIGINT)),
       |    'preds', CAST(array() AS ARRAY<BIGINT>),
       |    'pieces', CAST(array() AS ARRAY<STRING>)),
       |  (acc, i) -> element_at(transform(array(
       |      element_at(array_sort(filter(array(
       |        $cands
       |      ), c -> c.cost IS NOT NULL)), 1)
       |    ), b -> named_struct(
       |      'costs', concat(acc.costs, array(b.cost)),
       |      'preds', concat(acc.preds, array(b.strt)),
       |      'pieces', concat(acc.pieces, array(b.piece)))), 1))""".stripMargin
  }

  /** The backtrace fold over a DP result named `d` and the word `w`:
    * walks pred pointers down from pos = length(w), emitting the
    * chosen piece at every visited position. */
  private[graft] val btExprStr: String =
    s"""aggregate(sequence(1, length(w)),
       |  named_struct('pos', CAST(length(w) AS BIGINT),
       |    'out', CAST(array() AS ARRAY<STRING>)),
       |  (acc, x) -> IF(acc.pos > 0, named_struct(
       |      'pos', element_at(d.preds, CAST(acc.pos AS INT)),
       |      'out', concat(acc.out, array(element_at(d.pieces, CAST(acc.pos AS INT))))),
       |    acc),
       |  acc -> acc.out)""".stripMargin

  /** Per-token (cost, np) budget structs over a token array named
    * `__toks` against the cost map `cmap` — the whole unigram
    * train-side arithmetic replayed per ROW, for the streaming gate
    * ([[graft.streaming.Curation.lmQualityGate]]): each token binds
    * `w`, runs the DP once (bound via a one-element transform so the
    * backtrace does not re-evaluate it), and reports its final cost
    * and path length. NULL on a NULL token array (null text). */
  private[graft] def tokenBudgetExpr(maxPieceLen: Int): String =
    s"""transform(__toks, w -> element_at(transform(array(${dpExprStr(maxPieceLen)}),
       |  d -> named_struct(
       |    'cost', element_at(d.costs, CAST(length(w) AS INT) + 1),
       |    'np', CAST(size($btExprStr) AS BIGINT))), 1))""".stripMargin

  /** The unigram model's broadcastable static state — the one-row cost
    * map ([[costMapRow]]) of the corpus-trained piece vocabulary: what
    * a production system persists beside its tokenizer and ships to
    * every ingest worker. */
  def unigramCostMap(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512): DataFrame =
    costMapRow(unigramVocab(unigramWords(docs, textCol, maxWordLen),
      maxPieceLen, seedSize))

  /** The corpus-wide ppl_q cut values of [[lmQualityBuckets]] as a
    * ONE-ROW frame `(p33, p67)` — the other half of the gate's static
    * state (NULL cuts over an all-empty corpus; the gate then buckets
    * everything 'empty'/'tail' deterministically). */
  def lmQualityCuts(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 12,
      seedSize: Int = 512): DataFrame = {
    val scored = lmScored(docs, textCol, maxPieceLen, maxWordLen, seedSize)
    Quantiles.globalQuantileDisc(
      scored.filter(col("n_pieces") > 0L),
      "ppl_q", Seq("p33" -> 0.33, "p67" -> 0.67),
      materializeInput = false) // the scored frame is already materialized
  }

  /** Bigram-LM quality buckets — the CONDITIONAL-probability upgrade
    * of [[lmQualityBuckets]] (q125): where the unigram filter scores
    * each piece in isolation, this scores every token by how
    * predictable it is GIVEN its predecessor — the direction real
    * CCNet travels (Wenzek 2020 uses a 5-gram KenLM; a bigram model
    * is its first-order member, and scrambled-but-common-words text
    * that fools q125 scores badly here). Model = the corpus's own
    * add-1-smoothed bigram LM: cost of an occurrence of (w1, w2) is
    * `log2q(c1(w1) + V) − log2q(c2(w1, w2) + 1)` in 1/64-log2 units
    * (p = (c2+1)/(c1+V); c1 = w1's context count Σ_w c2(w1, w), V =
    * distinct-token vocabulary) under the exact fixed-point log2
    * kernel ([[Mixing.log2qExpr]]) — all-BIGINT, so the sheet
    * oracles bitwise. Per doc: `(doc_id, n_bigrams, cost_q,
    * ppl_q = cost·2^20 DIV n_bigrams, bucket)` with head/middle/tail
    * at the exact discrete 33/67 cuts over non-empty docs (the q125
    * closing); docs with < 2 tokens bucket 'empty'.
    *
    * Scale shape (100 TB): ONE token-array pass feeds model and
    * scoring (materialized); bigram occurrences collapse map-side
    * onto (doc, w1, w2) count keys BEFORE anything joins; the model
    * sheet is (w1, w2)-keyed narrow count rows log-chained in place;
    * the scoring join shuffles count rows on the bigram key once;
    * per-doc sums combine map-side; the cuts are the q40 global
    * discrete-percentile pass over 16-byte rows. Token text never
    * crosses an exchange after the count collapse. */
  def bigramLmQuality(docs: DataFrame, textCol: String = "text",
      maxWordLen: Int = 12): DataFrame = {
    require(maxWordLen >= 1, s"maxWordLen must be >= 1, got $maxWordLen")
    val tk = Dedup.materialize(docs.filter(col(textCol).isNotNull)
      .select(col("doc_id"), expr(
        s"filter(transform(split(lower($textCol), '\\\\s+'), " +
          s"t -> substring(t, 1, $maxWordLen)), w -> length(w) >= 1)").as("tk")))
    val pairs = Dedup.materialize(tk
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
        slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))))).as("p"))
      .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("occ")))
    val bg = Dedup.materialize(
      pairs.groupBy(col("w1"), col("w2")).agg(sum(col("occ")).as("c2")))
    val ug = bg.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vrow = tk.select(explode(col("tk")).as("w")).distinct()
      .agg(count(lit(1)).as("v"))
    val sheet = bg.join(ug, "w1").crossJoin(broadcast(vrow))
      .withColumn("bcost_q",
        expr(Mixing.log2qExpr("c1 + v")) - expr(Mixing.log2qExpr("c2 + 1")))
      .select(col("w1"), col("w2"), col("bcost_q"))
    val perDoc = pairs.join(sheet, Seq("w1", "w2"))
      .groupBy(col("doc_id")).agg(
        sum(col("occ")).as("n_bigrams"),
        sum(col("occ") * col("bcost_q")).as("cost_q"))
    val scored = Dedup.materialize(
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("cost_q"), lit(0L)).as("cost_q"))
        .withColumn("ppl_q", when(col("n_bigrams") > 0L,
          expr(s"CAST((cost_q * $Q) DIV n_bigrams AS BIGINT)")).otherwise(0L)))
    // distributed radix select — no single-task sort of the corpus
    val cuts = Quantiles.globalQuantileDisc(
      scored.filter(col("n_bigrams") > 0L),
      "ppl_q", Seq("p33" -> 0.33, "p67" -> 0.67),
      materializeInput = false) // the scored frame is already materialized
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_bigrams"), col("cost_q"), col("ppl_q"),
        when(col("n_bigrams") === 0L, "empty")
          .when(col("ppl_q") <= col("p33"), "head")
          .when(col("ppl_q") <= col("p67"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** OOV-rate audit — the operational readout behind the streaming
    * gate's UNK fallback ([[UnkCost]]): for each INCOMING document
    * (the q68/q114 md5-bucket split: `bucket < newPermille` is the
    * batch, the rest is the standing corpus), how much of it the
    * standing model cannot represent — `n_words` (token occurrences),
    * `n_oov_words` (occurrences of words containing ≥ 1 character
    * absent from the standing corpus's single-character vocabulary —
    * exactly the words whose Viterbi path takes UNK pieces), and
    * `oov_permille = 1000·n_oov DIV n_words`. A rising sheet means
    * the standing tokenizer is aging off the ingest distribution and
    * the q123 EM round should re-run — the vocabulary twin of the
    * q82 IVF drift report. Null-text and empty batch docs report
    * zeros (the q124 totality convention). All-BIGINT → bitwise
    * oracle.
    *
    * Scale shape (100 TB): the standing side collapses to its
    * CHARACTER census (alphabet-sized — broadcast as one row); the
    * batch side collapses map-side onto (doc, word) count keys, the
    * per-word check is one array_except against the broadcast
    * alphabet, and per-doc sums combine map-side on the one doc_id
    * exchange. Word text never crosses an exchange after the count
    * collapse. */
  def oovAudit(docs: DataFrame, textCol: String = "text",
      newPermille: Int = 100, maxWordLen: Int = 12,
      salt: String = "graft"): DataFrame = {
    require(newPermille >= 0 && newPermille <= 1000,
      s"newPermille must be in [0,1000], got $newPermille")
    require(maxWordLen >= 1, s"maxWordLen must be >= 1, got $maxWordLen")
    val flagged = Sampling.withSplitBucket(docs, "doc_id", salt)
      .withColumn("__new", col("__bucket") < newPermille).drop("__bucket")
    def words(df: DataFrame): DataFrame = df
      .filter(col(textCol).isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w0"))
      .filter(length(col("w0")) >= 1)
      .select(col("doc_id"), substring(col("w0"), 1, maxWordLen).as("w"))
    val vocabRow = words(flagged.filter(!col("__new")))
      .select(explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("c"))
      .distinct()
      .agg(array_sort(collect_list(col("c"))).as("vocab"))
    val perDoc = words(flagged.filter(col("__new")))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("occ"))
      .crossJoin(broadcast(vocabRow))
      .withColumn("is_oov",
        size(array_except(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          coalesce(col("vocab"), array().cast("array<string>")))) > 0)
      .groupBy(col("doc_id"))
      .agg(sum(col("occ")).as("n_words"),
        sum(when(col("is_oov"), col("occ")).otherwise(0L)).as("n_oov_words"))
    flagged.filter(col("__new")).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_oov_words"), lit(0L)).as("n_oov_words"))
      .withColumn("oov_permille",
        when(col("n_words") > 0L,
          expr("CAST((1000 * n_oov_words) DIV n_words AS BIGINT)"))
          .otherwise(0L))
  }

  def bpeFertilitySheet(docs: DataFrame, textCol: String,
      numMerges: Int = 8): DataFrame = {
    val enc = bpeEncode(docs, textCol, numMerges)
    docs.select(col("doc_id"), col("source"), col("lang"))
      .join(enc, "doc_id")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_words"),
        col("n_chars"), col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") /
          when(col("n_words") > 0L, col("n_words"))).as("fertility"),
        (col("n_chars").cast("double") /
          when(col("n_bpe_tokens") > 0L, col("n_bpe_tokens"))).as("compression"))
  }
}
