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

  /** Build a DataFrame from a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]` in Spark 4 — same subpackage-accessor pattern).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently register an extra planner strategy on the session.
    * Synchronized on the ExperimentalMethods instance: the read-modify-
    * write would otherwise race concurrent registrations (or concurrent
    * user code touching extraStrategies) and drop one of them.
    */
  def addStrategy(spark: org.apache.spark.sql.SparkSession,
      s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.experimental.synchronized {
      if (!cs.experimental.extraStrategies.contains(s))
        cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
    }
  }

  /** Release the storage behind a `localCheckpoint(eager = true)` frame.
    * `Dataset.unpersist` only consults the cache manager and never frees
    * checkpoint RDD blocks; iterative algorithms need deterministic
    * release of superseded rounds.
    */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
