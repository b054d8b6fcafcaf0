package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's unified `Column` hides the
  * catalyst expression behind `private[sql]` conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`); custom native
  * expressions need this one hop into the sql package namespace.
  */
object SparkBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
