package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst `Expression` (SURVEY §7.5 escalation path):
  * Spark's higher-order functions (`zip_with` + `aggregate`) do NOT
  * participate in whole-stage codegen — they evaluate interpreted, one
  * lambda invocation per element with an intermediate array allocation
  * per row. For similarity search that is the hot inner loop (64 mults ×
  * millions of candidate pairs). This expression compiles to a primitive
  * `double` loop over `ArrayData` inside WholeStageCodegen: no
  * allocation, no virtual calls.
  *
  * Numerics contract: strict left-fold double accumulation — the SAME
  * summation order as the `aggregate(zip_with(...))` formulation and as
  * DuckDB's `list_dot_product` on `DOUBLE[]`, so oracle comparisons stay
  * bitwise exact. Lengths are clamped to the shorter array; element
  * nulls are not expected (embedding vectors are dense) and read as 0.0
  * via ArrayData's primitive accessor.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Native codegen'd exact-integer squared L2 between two `array<double>`
  * columns at the PQ quantum 2^14 — the [[DotProductD]] escalation
  * applied to the product-quantization family's hottest loop:
  * `Σ (floor(aᵢ·2^14) − floor(bᵢ·2^14))²` accumulated in `long`.
  *
  * Semantics contract: bitwise identical to the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> floor(x·2^14)::long −
  * floor(y·2^14)::long), 0L, (acc, d) -> acc + d·d)` formulation
  * (property-pinned in SimilaritySpec) — `(long) Math.floor(x · 16384.0)`
  * is exactly Spark's `floor(double)→long`, and two's-complement long
  * addition is associative, so the left-to-right primitive loop computes
  * the same value as the HOF fold wherever the fold is defined.
  * Mismatched lengths return NULL (the HOF's null-padding makes the
  * whole fold NULL); element nulls are not expected (dense subvector
  * slices) and read as 0.0 via ArrayData's primitive accessor. Domain
  * contract: callers feed L2-NORMALIZED components (|x| ≤ 1), so every
  * term is ≤ 2^30 and the sum is 2^36-bounded at any real dimension —
  * the long-overflow regime (where ANSI mode makes the HOF throw and
  * this loop would wrap) is unreachable by construction.
  *
  * Why it exists: [[graft.operators.Similarity]]'s `pqAssign` evaluates
  * this distance m·ksub times per vector and the ADC lut |q|·m·ksub
  * times — interpreted HOFs cost a lambda invocation plus an
  * intermediate array allocation per element (the file-header measured
  * ~10× penalty); this compiles to an allocation-free primitive loop
  * inside WholeStageCodegen. */
case class PqDistQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pqdist expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  // length mismatch → null, so nullable even with non-null children
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) {
        val d = math.floor(x.getDouble(i) * 16384.0).toLong -
          math.floor(y.getDouble(i) * 16384.0).toLong
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = (long) java.lang.Math.floor($a.getDouble($i) * 16384.0)
         |      - (long) java.lang.Math.floor($b.getDouble($i) * 16384.0);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pqdist"
}
