package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline surface:
  * tokenization, token counting, quality scoring, language-ID heuristics,
  * shingling and document fingerprinting.
  *
  * Everything here is composed from codegen'd Catalyst expressions
  * (split/transform/filter/aggregate/md5 — no Scala UDFs), so the whole
  * stage stays inside WholeStageCodegen and scales linearly with input
  * bytes: the operative property at 100 TB, where a Python/Scala UDF
  * boundary would dominate the cost.
  *
  * Oracle-parity notes: every function has an exact DuckDB SQL mirror
  * (see ExtensionQueries): `split` keeps trailing empty tokens like
  * `string_split_regex`; `md5` is lowercase hex in both; min over md5
  * strings is plain lexicographic ASCII in both; ratio arithmetic is
  * int/int→double single IEEE ops.
  */
object TextFunctions {

  /** Small embedded stopword list (public, standard English function
    * words) — used for quality scoring. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  /** Language marker words for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"))

  /** Word n-grams over a token-array column as `"w1 w2 … wn"` strings —
    * the native codegen [[WordNgrams]] expression (`graft_ngrams`):
    * one tight loop per row, child evaluated once (the prior HOF
    * formulation re-evaluated a composite child per element — the
    * measured ~8× q74 hazard — and the relational window formulation
    * shuffled the whole token stream; see [[WordNgrams]]). Empty array
    * for docs with fewer than n tokens. */
  def tokenNgrams(toks: Column, n: Int): Column =
    NativeColumn(WordNgrams(NativeColumn.expr(toks), n))

  /** Longest run of consecutive identical tokens — the native codegen
    * [[MaxTokenRun]] expression (`graft_maxrun`): one comparison loop
    * per row, pure map-side work, zero shuffles (the prior higher-order
    * `aggregate` fold carried interpreted struct state per element).
    * The intra-document repetition signal (Gopher): a run ≥ 4 marks
    * degenerate "word word word …" text. */
  def maxTokenRun(toks: Column): Column =
    NativeColumn(MaxTokenRun(NativeColumn.expr(toks)))

  /** Whitespace tokens of the raw text (no case folding). */
  def rawTokens(text: Column): Column = split(text, "\\s+")

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Whitespace token count — the native [[TokenCount]] expression
    * (`graft_tokcount`): one byte loop, no token-array materialization;
    * count-identical to `size(split(text, "\\s+"))` on every input
    * (TokenCountSpec pins the equivalence property). Constructed
    * directly ([[NativeColumn]]) — no registry precondition for
    * DataFrame-API callers. */
  def tokenCount(text: Column): Column = NativeColumn(TokenCount(NativeColumn.expr(text)))

  /** BPE-style pre-tokenization pattern (GPT-2-family shape, public):
    * contractions, optionally-space-prefixed letter runs, digit runs,
    * punctuation runs. Kept in the Java∩RE2 common subset so the DuckDB
    * oracle matches. */
  val BpeishPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** Count of BPE-ish pre-tokens — the LLM-pipeline token estimator
    * (an actual BPE merge table is model-specific; the pre-tokenizer
    * split is the public, deterministic part). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern)).cast("long")

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]")).cast("long")

  /** Count of tokens that are stopwords. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords: _*))).cast("long")

  /** Composite quality score in [0,1]: length saturation + stopword
    * density + punctuation sparsity. Per-row double arithmetic —
    * deterministic and engine-identical. */
  def qualityScore(text: Column): Column = {
    val nTok  = greatest(tokenCount(text), lit(1L))
    val stopR = stopwordCount(text).cast("double") / nTok
    val punctR = punctCount(text).cast("double") / greatest(length(text).cast("long"), lit(1L))
    least(length(text).cast("double") / 1000.0, lit(1.0)) * 0.5 +
      stopR * 0.3 +
      (lit(1.0) - least(punctR * 5.0, lit(1.0))) * 0.2
  }

  /** Marker-word vote count for one language. */
  def langScore(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isin(LangMarkers(lang): _*))).cast("long")

  /** Heuristic language ID: argmax of marker votes with a fixed
    * priority order (en > de > fr > es) for ties. */
  def langId(text: Column): Column = {
    val en = langScore(text, "en"); val de = langScore(text, "de")
    val fr = langScore(text, "fr"); val es = langScore(text, "es")
    when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Distinct word 3-shingles (1-based `element_at`, mirroring the
    * DuckDB `toks[i]` indexing of the oracle SQL). */
  def shingles3(text: Column): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= 3,
        transform(sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
        .otherwise(array().cast("array<string>")))
  }

  /** Document fingerprint: minimum md5 over the doc's 3-shingles —
    * a 1-perm minhash; equal fingerprints ⇒ near-identical shingle
    * sets with high probability. NULL for docs with <3 tokens. */
  def minShingleFingerprint(text: Column): Column =
    array_min(transform(shingles3(text), s => md5(s)))

  /** 64-bit fingerprint via the codegen'd xxhash64 — the cheap
    * non-oracle path for joins/bucketing at scale. */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** Karp-Rabin polynomial fingerprint over code points — the native
    * codegen [[RollingHash]] expression (registered as `graft_kr`). */
  def rollingFingerprint(text: Column): Column =
    NativeColumn(RollingHash(NativeColumn.expr(text)))

  /** PII redaction patterns — deliberately restricted to explicit
    * character classes and bounded quantifiers, the regex subset on
    * which Java regex (Spark) and RE2 (DuckDB, re2-based engines)
    * match IDENTICALLY: no backreferences, no lookaround, no \b (RE2
    * and Java disagree on word-boundary corner cases around
    * punctuation). Longest-match greediness of these shapes is the
    * same in both engines, so redacted output oracle-compares
    * exactly. */
  val EmailPattern: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern: String = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Replace email addresses with `<EMAIL>`. Pure per-row map work —
    * zero shuffles at any scale, stays inside WholeStageCodegen. */
  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, "<EMAIL>")

  /** Replace dotted-quad IPs with `<IP>`. */
  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, "<IP>")
}
