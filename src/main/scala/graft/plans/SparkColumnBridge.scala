// The one file in the repo living under Spark's package namespace: the
// Column ↔ Expression converters are `private[sql]` in Spark 4 (the
// Column class wraps a ColumnNode, not an Expression), and an expression
// carrying a non-SQL-encodable payload (graft_ivf_assign's centroid
// table) cannot go through the FunctionRegistry. A child package of
// org.apache.spark.sql is the documented extension seam for this — the
// same access trick every Spark connector/extension library uses.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
