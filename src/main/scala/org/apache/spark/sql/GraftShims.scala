package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the standard pattern for libraries that ship native Catalyst
  * expressions (Spark 4 hid the direct `Column(expr)` constructor
  * behind the Connect-compatible ColumnNode API).
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
