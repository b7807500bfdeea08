package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * Spark 4 made the `Column(expr)` constructor `private[sql]` (Columns are
  * plan-agnostic nodes for Connect compatibility); a one-line accessor in
  * an `org.apache.spark.sql` subpackage is the standard extension-library
  * pattern for classic-mode engines.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
