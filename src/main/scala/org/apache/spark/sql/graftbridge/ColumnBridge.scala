package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim for the `private[sql]` Column ⇄ Expression conversions
  * of the classic module (`ExpressionUtils`, columnNodeSupport.scala).
  * Lives in an `org.apache.spark.sql` subpackage solely to satisfy the
  * `private[sql]` qualifier — the standard extension-library pattern
  * (Delta Lake, Frameless, and most Catalyst-extending libraries ship
  * the same one-file bridge). Consumed only by
  * [[graft.functions.NativeColumn]]; everything else in the engine
  * stays in the public API.
  */
object ColumnBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
