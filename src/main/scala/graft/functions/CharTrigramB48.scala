package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd md5-48 hashes of every CHARACTER TRIGRAM of a
  * string: output[i] = the 48-bit integer of the first 12 md5-hex
  * digits of code points i..i+2 (1-based position i+1), i.e. exactly
  * `transform(sequence(1, length(t) - 2), i ->
  * graft_md5b48(md5(substr(t, i, 3))))` — the lang-ID feature idiom —
  * for strings of ≥ 3 code points, and an empty array otherwise.
  *
  * Why a custom Expression (SURVEY §7.5, the [[WordNgrams]]
  * precedent): this kernel runs once per corpus row under EVERY
  * lang-ID member (the evidence sheet, the apply act, both drift
  * monitors, the per-source KL — and through the acquisition
  * scorecard every policy query), and the `transform` formulation
  * evaluates an INTERPRETED lambda per trigram that allocates a
  * 3-char UTF8String (substr), a 32-char hex UTF8String (md5) and a
  * MessageDigest instance per element. This expression is one static
  * call inside WholeStageCodegen: one byte-offset walk per document,
  * one thread-local MessageDigest reused across all trigrams, MD5 fed
  * directly from the document's byte array (no substring copies), and
  * the 48-bit value read from the digest's first 6 bytes (no hex
  * round-trip — the first 12 lowercase hex digits ARE the first 6
  * bytes big-endian).
  *
  * Value contract: bit-identical to the legacy expression tree on
  * every input — MD5 runs over the identical UTF-8 byte slices
  * (UTF8String.substring slices on code-point boundaries; so does the
  * offset walk here), and Σ hexdigit_j·16^(11−j) over lowercase hex
  * equals the big-endian integer of digest bytes 0..5. NULL
  * propagates; < 3 code points yields an empty array (the callers
  * filter `length(t) >= 3` anyway — the legacy `sequence(1, len-2)`
  * would error there, so this is the total superset).
  */
case class CharTrigramB48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_b48 expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    CharTrigramB48.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharTrigramB48.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_trigram_b48"
}

object CharTrigramB48 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and generated code (one static call —
    * the [[Md5Base48]]/[[WordNgrams]] pattern). */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // code-point start offsets (starts(k) = byte offset of code point
    // k; starts(n) = nb), the same boundaries UTF8String.substring
    // walks — one pass per document
    var n = 0
    var off = 0
    while (off < nb) { // count first
      off += UTF8String.numBytesForFirstByte(bytes(off))
      n += 1
    }
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](n + 1)
    off = 0
    var k = 0
    while (off < nb) {
      starts(k) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      k += 1
    }
    starts(n) = nb
    val md = digests.get()
    val buf = new Array[Byte](16)
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      md.reset()
      md.update(bytes, starts(i), starts(i + 3) - starts(i))
      md.digest(buf, 0, 16)
      out(i) =
        ((buf(0) & 0xFFL) << 40) | ((buf(1) & 0xFFL) << 32) |
        ((buf(2) & 0xFFL) << 24) | ((buf(3) & 0xFFL) << 16) |
        ((buf(4) & 0xFFL) << 8) | (buf(5) & 0xFFL)
      i += 1
    }
    new GenericArrayData(out)
  }
}
