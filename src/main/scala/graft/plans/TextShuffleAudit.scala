package graft.plans

import org.apache.spark.sql.DataFrame
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

  /** Text-carrying shuffle exchanges in `df`'s executed plan, rendered
    * as the offending column lists — empty iff the plan never shuffles
    * text.
    */
  def offendingExchanges(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike
          if e.child.output.exists(a => TextLikeCols(a.name)) =>
        e.child.output.collect { case a if TextLikeCols(a.name) => a.name }
          .mkString(",")
    }
}
