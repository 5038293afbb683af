package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for parameterized expressions that are not
  * registered by name (Spark 4 made Column ColumnNode-backed; the classic
  * converters live in private[sql] ExpressionUtils). */
object Columns {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
