package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the engine's native Catalyst
  * expressions. Spark 4's unified Column API hides the classic
  * converters behind `private[sql]`; this subpackage accessor is the
  * sanctioned pattern for libraries extending Catalyst (the
  * alternative — session function registration — is also provided by
  * [[graft.plans.GraftExtensions]], but a Column handle shouldn't
  * require a registered session). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
