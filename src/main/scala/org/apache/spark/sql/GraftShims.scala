package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between [[Column]] and catalyst [[Expression]] for custom
  * expressions (Spark 4 made the converters `private[sql]`; a shim in
  * the sql package is the standard extension-library pattern —
  * public-Spark-ecosystem projects do the same). */
object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
