package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for the engine's native codegen
  * expressions.
  *
  * The DataFrame-API builders (`TextFunctions.tokenCount`,
  * `Dedup.md5Base48`, `Similarity.dot`, …) construct their Catalyst
  * expressions DIRECTLY through this bridge instead of resolving them
  * by name via `call_function`: a name lookup adds an implicit runtime
  * precondition that [[graft.GraftSession.ensureConfs]] (or the
  * `GraftExtensions` session extension) already registered the
  * function, and a library caller that misses it gets an
  * unresolved-function analysis error instead of a compile-time
  * signal. Direct construction removes that precondition from the
  * whole Scala API surface; the SQL names (`graft_dot(…)` in
  * `spark.sql`) still resolve through the registry for SQL callers.
  *
  * The conversions delegate (via
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]], the one-file
  * `private[sql]` access shim) to the classic module's
  * `ExpressionUtils` — the same conversion `call_function` itself
  * performs on its argument Columns, so plans are identical either
  * way.
  */
private[graft] object NativeColumn {

  /** Wrap a Catalyst expression as a DataFrame API Column. */
  def apply(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
}
