package graft.operators

import org.apache.spark.sql.DataFrame
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
    val wc = docs.filter(col(textCol).isNotNull)
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    wc.select(col("cnt"), explode(expr(
        "transform(sequence(1, length(w) - 1), " +
        "i -> named_struct('c1', substr(w, i, 1), 'c2', substr(w, i + 1, 1)))")).as("p"))
      .select(col("p.c1").as("c1"), col("p.c2").as("c2"), col("cnt"))
      .groupBy(col("c1"), col("c2")).agg(sum(col("cnt")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("c1"), col("c2"))
      .limit(k)
  }
}
