package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for custom Catalyst expressions. Spark 4
  * made the classic converters `private[sql]`; exposing them from within
  * the package is the standard pattern for Spark-native extension
  * libraries (the expressions themselves are plain public Catalyst API).
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
