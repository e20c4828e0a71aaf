package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Karp-Rabin polynomial fingerprint of a string:
  * h = fold over Unicode code points of (h·B + cp) mod P with B = 131
  * and P = 2³¹−1. The rolling-hash document fingerprint of the
  * task brief's text-analysis family, complementing the md5 shingle
  * fingerprint (q27) and xxhash64 (`fingerprint64`) with the
  * incrementally-updatable polynomial form content-defined chunking
  * and streaming fingerprinters use.
  *
  * Why a custom Expression (SURVEY §7.5 escalation path): the fold is
  * per-CHARACTER, so any HOF formulation (`aggregate` over a split-
  * to-chars array) allocates a per-row array of single-char strings
  * and evaluates interpreted — this compiles to a primitive long loop
  * over the string's code points inside WholeStageCodegen.
  *
  * Oracle parity: P < 2³¹ keeps every intermediate < 2³⁹ — exact in
  * BIGINT, so DuckDB reproduces the fold with list_reduce over
  * `unicode()` code points (spelled out in the q78 oracle). Empty
  * string hashes to 0; NULL propagates.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kr expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    RollingHash.hash(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_kr"
}

object RollingHash {
  final val Base = 131L
  final val Mod = 2147483647L // 2^31 - 1

  /** Shared by interpreted eval and generated code (the JIT inlines a
    * static call; duplicating the loop into codegen buys nothing). */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
