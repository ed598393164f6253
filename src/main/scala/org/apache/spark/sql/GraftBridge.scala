package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversions for
  * graft's native Catalyst expressions (the classic third-party-extension
  * pattern: one tiny object inside the sql package, nothing else).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a LogicalPlan (Dataset.ofRows is private[sql]). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Identical copy of the session — same runtime confs, temp views,
    * registered functions — sharing the SparkContext, catalog, and
    * cache, but with ISOLATED conf state (cloneSession is private[sql]).
    * This is the transport for query-scoped conf overrides: mutate the
    * clone, never the caller's session.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
