package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The Dolma/C4-style document quality rules as ONE shared kernel —
  * the q74 audit (first-failing reason by precedence) and the q141
  * co-fire overlap matrix read the same [[flags]] frame, so the two
  * reports cannot drift apart (the repo's one-textual-definition
  * convention; the oracles share a CTE chain the same way).
  *
  * Rules (all thresholds integer-cross-multiplied, no floats):
  *  - `too_short`: < 20 whitespace tokens;
  *  - `non_english`: declared lang ≠ 'en';
  *  - `repetitive`: the q72 corpus-level ∪ q73 intra-doc lines —
  *    top bigram > 18% of bigram mass, top token > 20% of tokens,
  *    a ≥ 4 identical-token run, or > 30% duplicate 3-grams;
  *  - `low_stopword`: stopword mass < 2% (the machine-generated smell).
  *
  * Scale shape (100 TB): the only shuffles are the two-level
  * (doc_id, term)/(doc_id, bigram) aggregations (map-side combined);
  * the run/3-gram/stopword stats ride the same scan map-side; every
  * closing is a projection or a ≤10-key global aggregate. */
object QualityRules {

  /** One row per document: the rule-input stats and the four
    * INDEPENDENT boolean flags (no precedence applied — that is
    * [[audit]]'s closing CASE). Null-text documents carry null stats
    * and therefore null flags, exactly the q74 fall-through. */
  def flags(docs: DataFrame): DataFrame = {
    graft.GraftSession.ensureConfs(docs.sparkSession)
    // toks MUST be a materialized column before tokenNgrams sees it:
    // inlining the split into the lambda would re-evaluate it per
    // element (measured ~8× on q74)
    val base = docs
      .select(col("doc_id"), col("lang"),
        TextFunctions.stopwordCount(col("text")).as("stop_cnt"),
        TextFunctions.rawTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), col("stop_cnt"),
        size(col("toks")).cast("long").as("n_tokens"),
        TextFunctions.maxTokenRun(col("toks")).as("max_token_run"),
        TextFunctions.tokenNgrams(col("toks"), 3).as("g3"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("stop_cnt"),
        col("max_token_run"),
        size(col("g3")).cast("long").as("n_3grams"),
        size(array_distinct(col("g3"))).cast("long").as("n_distinct_3grams"))
    val toks = docs.select(
      col("doc_id"), TextFunctions.rawTokens(col("text")).as("toks"))
    val topTok = toks
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_token_n"))
    val gramStats = toks
      .select(col("doc_id"),
        explode(TextFunctions.tokenNgrams(col("toks"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        max(col("c")).as("top_bigram_n"),
        sum(col("c")).as("n_bigrams"))
    base.join(topTok, Seq("doc_id"))
      .join(gramStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") < 20).as("too_short"),
        (col("lang") =!= "en").as("non_english"),
        (lit(50) * coalesce(col("top_bigram_n"), lit(0L)) >
            lit(9) * coalesce(col("n_bigrams"), lit(0L)) ||
          lit(5) * col("top_token_n") > col("n_tokens") ||
          col("max_token_run") >= 4 ||
          lit(10) * (col("n_3grams") - col("n_distinct_3grams")) >
            lit(3) * col("n_3grams")).as("repetitive"),
        (lit(50) * col("stop_cnt") < col("n_tokens")).as("low_stopword"))
  }

  /** The rule names in precedence/declaration order — the single list
    * [[audit]], [[overlapMatrix]] and the oracles index. */
  val RuleNames: Seq[String] =
    Seq("too_short", "non_english", "repetitive", "low_stopword")

  /** q74's closing: first failing rule by precedence, 'kept'
    * otherwise. (doc_id, n_tokens, reason, kept). */
  def audit(docs: DataFrame): DataFrame =
    flags(docs)
      .select(col("doc_id"), col("n_tokens"),
        when(col("too_short"), "too_short")
          .when(col("non_english"), "non_english")
          .when(col("repetitive"), "repetitive")
          .when(col("low_stopword"), "low_stopword")
          .otherwise("kept").as("reason"))
      .select(col("doc_id"), col("n_tokens"), col("reason"),
        when(col("reason") === "kept", 1L).otherwise(0L).as("kept"))

  /** q141: the rule CO-FIRE matrix — how many documents each PAIR of
    * independently-evaluated rules kills in common. The q74 audit's
    * precedence hides this (a doc dying too_short never shows its
    * repetition), but tuning a filter cascade needs exactly the
    * overlap: a rule whose kills are a subset of an earlier rule's is
    * dead weight, and a near-zero off-diagonal says the rules measure
    * independent failure modes. One row per unordered pair (diagonal
    * = the rule's independent kill count):
    * `(rule_a, rule_b, n_docs)` — 10 rows at 4 rules.
    *
    * Scale shape: [[flags]]' audited shape plus ONE global aggregate
    * of 10 boolean-pair sums collapsed map-side (a single row crosses
    * the exchange), exploded driver-free into the long sheet. */
  def overlapMatrix(docs: DataFrame): DataFrame = {
    val f = flags(docs)
    val pairs = for {
      i <- RuleNames.indices
      j <- i until RuleNames.size
    } yield (RuleNames(i), RuleNames(j))
    val sums = f.agg(
      count(lit(1)).as("__n"),
      pairs.map { case (a, b) =>
        sum(when(col(a) && col(b), 1L).otherwise(0L)).as(s"__$a|$b")
      }: _*)
    sums.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("rule_a"), lit(b).as("rule_b"),
          col(s"__$a|$b").as("n_docs"))
      }: _*)).as("e"))
      .select(col("e.rule_a"), col("e.rule_b"), col("e.n_docs"))
  }
}
