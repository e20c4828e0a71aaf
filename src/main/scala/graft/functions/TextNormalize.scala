package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Training-corpus text cleaning: unicode NFC canonicalization, accent
  * stripping, control-character stripping, whitespace collapse — the
  * standard normalization pass before tokenization/dedup, composed from
  * codegen'd pieces (the [[UnicodeNormalize]] expression + built-in
  * regexp_replace; zero UDFs, zero per-row allocation outside the
  * regex engine).
  *
  * All steps are pure per-row expressions: no shuffle, no state —
  * normalization of 100 TB is exactly one map-side pass fused into
  * whatever scan feeds it.
  *
  * DuckDB parity (verified by q61): `stripAccents` = NFD + drop
  * combining marks (`\p{M}`), which agrees with DuckDB's
  * utf8proc-based `strip_accents` on canonical text; control stripping
  * preserves tab/newline (whitespace-class controls) so the collapse
  * step owns ALL whitespace decisions. */
object TextNormalize {

  /** Canonical composition (NFC) — the [[UnicodeNormalize]] codegen
    * expression, constructed directly ([[NativeColumn]]; the SQL name
    * `graft_nfc` still resolves via the session registry). */
  def nfc(c: Column): Column = NativeColumn(UnicodeNormalize(NativeColumn.expr(c), "NFC"))

  /** Canonical decomposition (NFD). */
  def nfd(c: Column): Column = NativeColumn(UnicodeNormalize(NativeColumn.expr(c), "NFD"))

  /** Accent stripping: decompose, then drop every combining mark.
    * (Deliberately NOT a translate() lookup table — NFD + `\p{M}`
    * covers all of Latin/Greek/Cyrillic diacritics in one rule.) */
  def stripAccents(c: Column): Column = regexp_replace(nfd(c), "\\p{M}+", "")

  /** Drop non-whitespace C0/C1-range control characters (BEL, NUL,
    * escape, …); tab/newline/CR survive for [[collapseWhitespace]]. */
  def stripControls(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  /** Collapse whitespace runs to single spaces and trim the ends. */
  def collapseWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The full cleaning pass: accent strip (which decomposes) → control
    * strip → whitespace collapse → final NFC recomposition. The closing
    * NFC matters beyond Latin: stripAccents leaves NFD form, and
    * scripts with non-mark canonical decompositions (e.g. Hangul
    * syllables decompose to Jamo LETTERS, which mark-stripping rightly
    * keeps) must come back out composed. Output is NFC, mark-free. */
  def normalizeText(c: Column): Column =
    nfc(collapseWhitespace(stripControls(stripAccents(c))))
}
