package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 48-bit integer from the first 12 hex digits of an
  * md5-hex string — THE bucket/permutation base of the engine's whole
  * deterministic-hashing family ([[graft.operators.Dedup.md5Base48]]:
  * minhash permutation input per SHINGLE ROW, the q55 split bucket per
  * corpus row, the q83 span keys per window). This is the engine's
  * hottest scalar, which is why it rates the custom-Expression
  * escalation (SURVEY §7.5): the legacy formulation was a 12-term
  * `instr(alphabet, substring(h, j, 1))` expression tree — 12
  * single-char UTF8String allocations plus 12 alphabet scans per row —
  * while this compiles to one primitive byte loop inside
  * WholeStageCodegen.
  *
  * Value contract: bit-identical to the legacy tree (and to the DuckDB
  * oracle mirror, `DecontaminateOracle.bucketExpr`) on EVERY input, not
  * just well-formed hex: digit = (position of the char in
  * `0123456789abcdef`) − 1, so a non-hex char contributes −1·16^(11−j)
  * (`instr` misses → 0 → −1) and a position past the end contributes 0
  * (`substring` → `''`, `instr(x, '') = 1` → 0). ASCII inputs take the
  * byte loop; a non-ASCII char among the first 12 falls back to an
  * equivalent code-point walk (md5 hex never does — the fallback exists
  * so the expression is total, not fast). NULL propagates.
  */
case class Md5Base48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5b48 expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5Base48.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Base48.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_md5b48"
}

object Md5Base48 {
  private final val Alphabet = "0123456789abcdef"

  /** Shared by interpreted eval and generated code (static call; the
    * JIT inlines it — the RollingHash precedent). */
  def compute(s: UTF8String): Long = {
    val nb = s.numBytes
    val probe = math.min(12, nb)
    var j = 0
    while (j < probe) {
      if ((s.getByte(j) & 0x80) != 0) return computeCodePoints(s)
      j += 1
    }
    // first min(12, nb) bytes are ASCII, so byte index == char index
    var acc = 0L
    j = 0
    while (j < 12) {
      val digit = if (j < nb) hexDigit(s.getByte(j)) else 0
      acc += digit.toLong << (4 * (11 - j))
      j += 1
    }
    acc
  }

  private def hexDigit(b: Byte): Int = {
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else -1
  }

  /** Legacy-identical slow path for non-ASCII input: one code point per
    * `substring(h, j, 1)` position, alphabet lookup by code point. */
  private def computeCodePoints(s: UTF8String): Long = {
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    var acc = 0L
    var j = 0
    while (j < 12) {
      val digit =
        if (j < cpCount)
          Alphabet.indexOf(str.codePointAt(str.offsetByCodePoints(0, j)))
        else 0
      acc += digit.toLong << (4 * (11 - j))
      j += 1
    }
    acc
  }
}
