package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the Column API backend-agnostic (ColumnNode) and scoped the
  * classic converters `private[sql]`; third-party expression libraries
  * (and Spark's own connectors) reach them by placing one shim inside the
  * org.apache.spark.sql package tree. This is the only file outside the
  * graft namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
