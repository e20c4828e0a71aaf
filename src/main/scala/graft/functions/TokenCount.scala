package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd whitespace token count —
  * `size(split(text, "\\s+"))` without materializing the token array.
  *
  * The count identity: `split` with Java's default limit −1 yields
  * (number of maximal `\s+` runs) + 1 elements for EVERY input —
  * leading runs contribute a leading `""` element, trailing runs a
  * trailing one, so position never matters. One byte loop computes
  * that directly; the legacy formulation allocated the full token
  * array (one UTF8String per token plus the array) per row just to
  * take its length — and this is the engine's most-used per-doc
  * scalar (datasheet volume, allocation sizes, packing, snapshot
  * diffs, quality gates).
  *
  * Whitespace set: Java regex `\s` = `[ \t\n\x0B\f\r]` — pure ASCII,
  * so the byte loop is UTF-8-safe without decoding (multi-byte
  * sequences have the high bit set on every byte and can never match).
  * Identical to the RE2 `\s` the DuckDB oracles use in
  * `string_split_regex`. NULL propagates (the legacy `size(split(.))`
  * is also NULL on NULL input under non-legacy `sizeOfNull`). */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokcount expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    TokenCount.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCount.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_tokcount"
}

object TokenCount {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val nb = s.numBytes
    var runs = 0L
    var inRun = false
    var i = 0
    while (i < nb) {
      val ws = isWs(s.getByte(i))
      if (ws && !inRun) runs += 1
      inRun = ws
      i += 1
    }
    runs + 1L
  }
}
