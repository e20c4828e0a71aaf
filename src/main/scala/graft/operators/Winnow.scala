package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): from each window of `window` consecutive
  * token-k-gram hashes, select ONE — the minimal hash, rightmost on
  * ties — and the selected (hash, position) pairs, deduped, are the
  * document's fingerprint sketch. The guarantee the whole construction
  * exists for: any verbatim run of ≥ window + k − 1 tokens shared by
  * two documents contributes at least one IDENTICAL fingerprint to
  * both, at a sketch density of ~2/(window+1) — local, positional
  * near-dup evidence the set-global MinHash sketch (q28) cannot give,
  * and the selection step q83's exhaustive span keys skip (winnowing
  * ships ~2/(w+1) of the grams; q83 ships all of them).
  *
  * Determinism on BOTH engines via one integer: each gram encodes
  * `enc = h36 · 2²⁴ + (2²⁴−1 − i)`, so a plain window `min(enc)` IS
  * "min hash, rightmost tie" — no argmin/min_by construct needed.
  * Contracts: gram index i < 2²⁴ (a 16M-gram doc is ~64 MB of text —
  * far past any sane document bound; violations raise_error LOUDLY
  * rather than silently bleeding into the adjacent hash's keyspace)
  * and h36 = 36-bit md5 prefix reduction (pair-window collision ~2⁻³⁶
  * — vanishing for candidate detection, the ≥ minShared threshold
  * absorbs strays, and the oracle mirrors the same arithmetic so the
  * check is bitwise either way).
  */
object Winnow {

  val H36: Long = 1L << 36
  val PosPack: Long = 1L << 24

  /** Selected fingerprints `(doc_id, fp_h, fp_pos)` — distinct per doc.
    * Scale shape: grams and the window selection are per-doc local (ONE
    * doc_id-keyed exchange for the window sort — 16-byte rows, the text
    * column never moves past the gram hash); the distinct collapses
    * ~window overlapping selections map-side first. */
  def fingerprints(docs: DataFrame, window: Int = 4): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    graft.GraftSession.ensureConfs(docs.sparkSession)
    val grams = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokenNgrams(
          split(lower(col("text")), "\\s+"), 3)))
      .toDF("doc_id", "p", "sh")
      // 1-based gram index, shared with the oracle's range(1, ...)
      .select(col("doc_id"), (col("p") + 1).cast("long").as("i"),
        (Dedup.md5Base48Of(md5(col("sh"))) % H36).as("h36"))
    // the contract check is fused into enc so the optimizer cannot
    // prune it: a >= 2^24-gram doc fails LOUDLY instead of silently
    // corrupting fingerprints across the pack boundary
    val enc = grams.select(col("doc_id"), col("i"),
      when(col("i") >= PosPack, expr(
          s"raise_error('winnow: gram index >= $PosPack (a ~64MB doc) — widen PosPack')")
          .cast("long"))
        .otherwise(col("h36") * PosPack + (lit(PosPack - 1) - col("i"))).as("enc"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, window - 1)
    val n = Window.partitionBy(col("doc_id"))
    enc.select(col("doc_id"), col("i"),
        min(col("enc")).over(w).as("sel"),
        count(lit(1)).over(n).as("n"))
      .filter(col("i") <= col("n") - (window - 1))  // full windows only
      // integral DIV, not `/`: double division would lose low bits of a
      // 60-bit encoding
      .select(col("doc_id"),
        expr(s"CAST(sel DIV $PosPack AS BIGINT)").as("fp_h"),
        (lit(PosPack - 1) - pmod(col("sel"), lit(PosPack))).as("fp_pos"))
      .distinct()
  }

  /** Cross-document fingerprint matches `(a_id, b_id, n_shared)` at
    * ≥ `minShared` shared fingerprint hashes — plagiarism-style local
    * overlap detection. `maxDf` is the q66 hot-key bound: a fingerprint
    * in thousands of docs is a quadratic join key carrying no local
    * signal (boilerplate the q115 scrub should have removed).
    * Scale shape: the join fans out ≤ maxDf per hash, so it is linear
    * in fingerprint volume — itself ~2/(window+1) of gram volume. */
  def matches(docs: DataFrame, window: Int = 4, minShared: Long = 2L,
      maxDf: Long = 20L): DataFrame = {
    val fp = Dedup.materialize(
      fingerprints(docs, window).select(col("doc_id"), col("fp_h")).distinct())
    val rare = fp.groupBy(col("fp_h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("fp_h"))
    val capped = fp.join(rare, Seq("fp_h"), "left_semi")
    val a = capped.select(col("fp_h"), col("doc_id").as("a_id"))
    val b = capped.select(col("fp_h"), col("doc_id").as("b_id"))
    a.join(b, "fp_h").filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
