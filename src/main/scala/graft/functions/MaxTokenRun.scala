package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd longest-run-of-identical-tokens over an
  * `array<string>` column — the Gopher intra-document repetition
  * signal (q73/q74). Replaces the higher-order `aggregate` fold
  * (struct state, interpreted per element with a lambda frame per
  * call) with a single comparison loop behind a static call inside
  * WholeStageCodegen — the [[RollingHash]]/[[WordNgrams]] pattern.
  *
  * Semantics (identical to the HOF it replaces, property-tested in
  * NgramKernelSpec): empty array → 0; a null element never EXTENDS a
  * run (the HOF's `x === prev` evaluates to SQL NULL when either side
  * is null, falling to the restart branch — mirrored exactly here),
  * but the restart branch counts the null itself as a fresh length-1
  * run — so an all-null array returns 1, not 0. */
case class MaxTokenRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_maxrun expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    MaxTokenRun.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MaxTokenRun.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_maxrun"
}

object MaxTokenRun {
  def compute(arr: ArrayData): Long = {
    val sz = arr.numElements()
    if (sz == 0) return 0L
    var best = 0L
    var run = 0L
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    var prevNull = true
    var first = true
    var i = 0
    while (i < sz) {
      val isNull = arr.isNullAt(i)
      val cur = if (isNull) null else arr.getUTF8String(i)
      val continues = !first && (if (isNull || prevNull) false else cur.equals(prev))
      run = if (continues) run + 1 else 1
      if (run > best) best = run
      prev = cur
      prevNull = isNull
      first = false
      i += 1
    }
    best
  }
}
