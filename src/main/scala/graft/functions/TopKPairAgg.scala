package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k of (score, id) pairs per group, ordered by
  * (score DESC, id ASC) — the two-phase answer to "rank per query and keep
  * k" that a per-query ROW_NUMBER window cannot give at scale: a window
  * partitioned by a scale-FIXED query set (e.g. 10 query vectors) funnels
  * the entire scored corpus into 10 tasks, while this aggregator's
  * map-side partials shrink every partition's contribution to k pairs
  * before the (tiny) shuffle. PlanHygieneSpec bans the window form.
  *
  * Comparison-only on the score (no float arithmetic) and totally ordered
  * via the id tiebreak, so results are exactly deterministic and
  * oracle-checkable against a ROW_NUMBER spelling.
  */
class TopKPairAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (score, id) => (-score, id) }

  def zero: Seq[(Double, Long)] = Seq.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted(ord).take(k)

  def reduce(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ v)

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()

  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
