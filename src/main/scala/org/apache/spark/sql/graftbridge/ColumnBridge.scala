package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `Column.expr` bridge; the
  * supported conversion lives in `org.apache.spark.sql.classic
  * .ExpressionUtils`, which is `private[sql]`. This shim (in a
  * `org.apache.spark.sql` subpackage, the standard pattern for Catalyst
  * extensions) re-exposes the two conversions the engine's custom
  * expressions need.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
