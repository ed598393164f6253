package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge}

/** Public API over the custom [[AsOfJoin]] operator. Sessions built with
  * [[GraftExtensions]] carry [[AsOfJoinStrategy]] already; for any other
  * session the strategy self-registers through
  * `spark.experimental.extraStrategies`, so the operator works everywhere.
  */
object AsOf {

  /** Backward as-of join: for each left row, the latest right row of the
    * same key with `rightTs <= leftTs`, or nulls. Key/ts columns must be
    * long-backed (bigint/timestamp) and non-null.
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val exp = left.sparkSession.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) = {
      import org.apache.spark.sql.types._
      val a = p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
      a.dataType match {
        case LongType | IntegerType | TimestampType | TimestampNTZType | DateType => a
        case other => throw new IllegalArgumentException(
          s"as-of column $n must be integral/timestamp-backed, got $other")
      }
    }
    GraftBridge.ofRows(
      left.sparkSession,
      AsOfJoin(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs)))
  }
}
