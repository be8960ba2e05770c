package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * Spark 4 made `ExpressionUtils` (and Column's `expr`) `private[sql]`;
  * custom Catalyst expressions still need to surface as `Column`s. This
  * object lives under the `org.apache.spark.sql` namespace solely to
  * re-export those two conversions to graft code — no Spark internals are
  * modified or shadowed.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
