package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC/NFD) as a native codegen'd
  * Catalyst expression — Spark ships no normalization builtin, and a
  * Scala UDF here would break the whole-stage-codegen span of the text
  * cleaning pipeline it anchors ([[TextNormalize]]).
  *
  * `form` must be "NFC" or "NFD" (validated at construction: it is
  * compiled into the generated code, so an invalid form must fail at
  * plan time, not as generated-code that doesn't compile). Registered
  * as `graft_nfc` / `graft_nfd` by [[graft.GraftSession.ensureConfs]]
  * and [[graft.GraftExtensions]].
  *
  * DuckDB parity: `nfc_normalize` mirrors the NFC form; DuckDB has no
  * NFD builtin, but NFD-then-strip-marks equals its `strip_accents` on
  * canonical text — the equivalence q61 exercises end-to-end. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(form == "NFC" || form == "NFD", s"unsupported normalization form: $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_${form.toLowerCase} expects a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = child.dataType match {
    case NullType => StringType
    case t        => t
  }

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = s"graft_${form.toLowerCase}"
}
