package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 64-bit packing of the first 16 hex digits of an
  * md5-hex string — the per-TOKEN kernel of the SimHash signature
  * ([[graft.operators.Dedup.simhashSignature]]). The legacy
  * formulation materialized 16 separate `instr(alphabet,
  * substring(h, k, 1)) − 1` digit columns per token row (16
  * single-char UTF8String allocations + 16 alphabet scans) before the
  * 64 bit-vote CASEs; this packs the digits into ONE long in a single
  * byte loop, and the votes become `shiftrightunsigned(v, j) & 1` —
  * pure long arithmetic inside WholeStageCodegen.
  *
  * Vote-space equivalence contract (what the q45/q47 oracles pin):
  * digit k occupies bits [4·(15−k)+3 .. 4·(15−k)] with digit 0 most
  * significant, so bit b of legacy digit d_k is
  * `shiftrightunsigned(v, 4·(15−k)+b) & 1`. Non-hex characters clamp
  * to 0 — bit-identical VOTES to the legacy tree's −1 digit, because
  * `(−1 div 2^b) % 2 ≠ 1` for every b: both shapes vote −1 on all
  * four bits. Positions past the end are 0 (legacy: `instr(x, '') − 1
  * = 0`). A non-ASCII character among the first 16 falls back to an
  * equivalent code-point walk, so the expression is total. NULL
  * propagates. The top nibble may set the sign bit — consumers must
  * extract with `shiftrightunsigned`, never arithmetic shift. */
case class Md5Bits64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5b64 expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5Bits64.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Bits64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_md5b64"
}

object Md5Bits64 {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val nb = s.numBytes
    val probe = math.min(16, nb)
    var j = 0
    while (j < probe) {
      if ((s.getByte(j) & 0x80) != 0) return computeCodePoints(s)
      j += 1
    }
    var acc = 0L
    j = 0
    while (j < 16) {
      val d = if (j < nb) hexDigitOrZero(s.getByte(j)) else 0
      acc = (acc << 4) | d
      j += 1
    }
    acc
  }

  private def hexDigitOrZero(b: Byte): Int = {
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else 0 // non-hex: vote-identical to the legacy −1 digit (see scaladoc)
  }

  private def computeCodePoints(s: UTF8String): Long = {
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    var acc = 0L
    var j = 0
    while (j < 16) {
      val d =
        if (j < cpCount) {
          val idx = "0123456789abcdef".indexOf(
            str.codePointAt(str.offsetByCodePoints(0, j)))
          if (idx < 0) 0 else idx
        } else 0
      acc = (acc << 4) | d
      j += 1
    }
    acc
  }
}
