package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split the public Column API from Catalyst Expressions; the
  * converters live in `private[sql]` ExpressionUtils. This bridge sits
  * in an org.apache.spark.sql subpackage (the standard extension
  * technique) to expose exactly the two conversions graft's custom
  * expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
