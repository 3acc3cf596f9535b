package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides these conversions behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so this
  * one-file shim lives in the `org.apache.spark.sql` namespace — the
  * standard extension-library pattern for exposing custom Catalyst
  * expressions as user-facing `Column`s.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
