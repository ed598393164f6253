package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Executed-plan walker behind the text-never-shuffles invariant: no
  * registered query may plan a ShuffleExchange whose INPUT carries a
  * text-like column. At 100 TB the text payload dominates every table's
  * byte size, so one accidental wide exchange (a presentation sort over
  * un-projected rows, a join keyed after the text column is rebuilt)
  * multiplies the query's shuffle bytes by the corpus size — the r10
  * audit found three such accidents (DSIR, hashedQuality,
  * q_gopher_rules), each with a narrow-checkpoint alternative.
  *
  * Shared by the CI gate (PlanHygieneSpec's registry sweep) and the
  * [[graft.TextShuffleScan]] dev tool (ad-hoc runs at other SFs).
  */
object TextShuffleAudit {
  /** Column names that carry document-scale text through the engine's
    * operators (raw text, lowercased, cleaned/normalized variants, and
    * per-line explode output).
    */
  val TextLikeCols: Set[String] =
    Set("text", "ltext", "cleaned", "norm", "dirty", "line")

  /** Every physical node in `p`, DESCENDING into adaptive plans:
    * AdaptiveSparkPlanExec reports no children (its plan lives behind
    * the node), so a plain `collect` over an AQE-wrapped query sees
    * exactly one leaf and nothing else — the r10 tool had this blind
    * spot, and its "0 hits" was vacuous for AQE subtrees. The walk
    * uses `initialPlan` (the prepared physical plan, AFTER
    * EnsureRequirements has inserted the exchanges — `inputPlan` is
    * pre-preparation and carries none of them). For this invariant the
    * initial plan is also the CONSERVATIVE choice: a text exchange AQE
    * might later convert to broadcast is still a planning defect at
    * 100 TB, where the small-side estimate that triggers the
    * conversion no longer holds.
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val direct = p.collect {
      case a: AdaptiveSparkPlanExec => allNodes(a.initialPlan)
      // cached subtrees: InMemoryTableScanExec is a leaf whose plan
      // hangs off the relation — the exchange that MATERIALIZES a
      // cache still runs once, so it counts
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        m +: allNodes(m.relation.cachedPlan)
      case x => Seq(x)
    }.flatten
    // subquery plans hang off EXPRESSIONS, not children — a text
    // exchange inside a scalar/IN subquery is invisible to the child
    // walk (the same blind-spot class as the AQE leaf)
    direct ++ direct.flatMap(_.subqueries.flatMap(allNodes))
  }

  /** Text-carrying shuffle exchanges in `df`'s executed plan (adaptive
    * subtrees included), rendered as the offending column lists —
    * empty iff the plan never moves text it didn't have to.
    *
    * PRESENTATION exemption: a RANGE exchange whose text-like columns
    * are all part of the query's FINAL output is the global
    * presentation sort of rows the caller asked for — "return ordered
    * rows containing text" cannot be answered without moving that
    * text once, so it is not a defect. Everything else is flagged: a
    * mid-plan hash exchange of text (a join or aggregation keyed
    * after text was attached — the DSIR/hashedQuality r10 class) and
    * a range exchange carrying text that is NOT in the output (text
    * dragged through an exchange only to be dropped or rebuilt — the
    * q_gopher_rules r10 class) both have narrow alternatives.
    */
  def offendingExchanges(df: DataFrame): Seq[String] = {
    val outCols = df.columns.toSet
    allNodes(df.queryExecution.executedPlan).flatMap {
      case e: ShuffleExchangeLike
          if e.child.output.exists(a => TextLikeCols(a.name)) =>
        val textCols = e.child.output.collect {
          case a if TextLikeCols(a.name) => a.name
        }
        val presentation = e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] &&
          textCols.forall(outCols)
        if (presentation) None else Some(textCols.mkString(","))
      case _ => None
    }
  }
}
