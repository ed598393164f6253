package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator custom Catalyst path (SURVEY.md §2A preference order
  * (c), guide "Custom operator"): a backward as-of join, the operator
  * Spark's SQL surface lacks natively. For every left row, emit the
  * single most recent right row of the same key with rightTs <= leftTs
  * (or nulls).
  *
  * Physical strategy: both sides hash-clustered on the key and sorted by
  * (key, ts) — EnsureRequirements inserts the exchanges/sorts — then a
  * single streaming merge pass per partition: O(|L| + |R|), constant
  * memory (one buffered right row), no per-key group materialization.
  * That is the shape that survives 100 TB: the window-trick rewrite
  * (q_asof_join) buffers whole partitions in the window operator, this
  * buffers one row.
  *
  * Constraints (documented, enforced by the API in [[AsOf]]): single
  * equi-key and single ascending timestamp per side, both evaluating to
  * non-null LONG-backed values (bigint / timestamp).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions silently mis-joins if the sides are clustered into
    // DIFFERENT partition counts (each child can satisfy its
    // ClusteredDistribution independently — e.g. a pre-repartitioned
    // input, or divergent AQE coalescing). EnsureRequirements'
    // co-partitioning pass makes the counts agree in every plan we
    // produce (AsOfJoinSpec pins the AQE + pre-partitioned cases), but
    // hash(key) % 7 and hash(key) % 32 put the same key in different
    // slots — a corrupt join must be impossible, not just untested.
    require(
      lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec requires co-partitioned children, got " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions} partitions")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rightWidth)
        private var rNext: InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Long = 0L

        override def hasNext: Boolean = lIter.hasNext

        // null key/ts on either side -> that row can never match (SQL
        // equi-join null semantics); sorts put nulls first, so skipping
        // null right rows up front keeps the merge invariant intact.
        override def next(): InternalRow = {
          val l = lIter.next()
          val lkV = lkB.eval(l)
          val ltV = ltB.eval(l)
          if (lkV == null || ltV == null) return joined(l, nullRight)
          val lk = lkV.asInstanceOf[Number].longValue()
          val lt = ltV.asInstanceOf[Number].longValue()
          var advancing = true
          while (advancing && rNext != null) {
            val rkV = rkB.eval(rNext)
            val rtV = rtB.eval(rNext)
            if (rkV == null || rtV == null) {
              rNext = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              val rk = rkV.asInstanceOf[Number].longValue()
              val rt = rtV.asInstanceOf[Number].longValue()
              if (rk < lk || (rk == lk && rt <= lt)) {
                if (rk == lk) { lastMatch = rNext; lastMatchKey = rk }
                rNext = if (rIter.hasNext) rIter.next().copy() else null
              } else advancing = false
            }
          }
          val r =
            if (lastMatch != null && lastMatchKey == lk) lastMatch else nullRight
          joined(l, r)
        }
      }
    }
  }
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
