package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word n-grams over an `array<string>` column:
  * output[i] = elements i..i+n-1 joined with a single space (null
  * elements skipped, `concat_ws` semantics); empty output for arrays
  * shorter than n.
  *
  * Why a custom Expression (SURVEY §7.5): this kernel is under EVERY
  * shingle consumer (minhash signatures, Jaccard/containment verify,
  * decontamination, the n-gram repetition stats). The two prior
  * formulations both lose at scale: the higher-order `transform`
  * evaluates interpreted per element with a lambda frame per call
  * (and benched 28 s at sf0.1 when fed to a generator), while the
  * relational posexplode + two window `lead`s is fast per row but
  * SHUFFLES THE ENTIRE TOKEN STREAM on doc_id — at 100 TB that window
  * exchange is the single largest data movement in the dedup
  * pipeline. This expression is a tight loop behind one static call
  * inside WholeStageCodegen: shingle assembly becomes pure map work
  * and the token-stream shuffle disappears from the plan.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    WordNgrams.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_ngrams"
}

object WordNgrams {
  private val Sep = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code (one static call —
    * the same pattern as [[RollingHash.hash]]). */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    val m = if (sz >= n) sz - n + 1 else 0
    val out = new Array[AnyRef](m)
    // one reusable window buffer; concatWs copies, so reuse is safe
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
