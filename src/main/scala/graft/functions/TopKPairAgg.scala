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

  /** SQL `ORDER BY score DESC, id` semantics exactly: NaN sorts as the
    * GREATEST score (first under DESC, matching Spark's and DuckDB's
    * ordering — `Ordering.by(-score)` would negate NaN into sorting
    * last), and -0.0 == 0.0 (both engines normalize; raw
    * Double.compare would order them and flip the id tiebreak). A null
    * score never reaches this point: the non-nullable input encoder
    * fails loudly first — preferable to silently diverging from the
    * oracle's window form, which would have ranked nulls.
    */
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(norm(b._1), norm(a._1))
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  def zero: Seq[(Double, Long)] = Seq.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted(ord).take(k)

  def reduce(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    // hot path: once the buffer is full, most rows lose to the current
    // worst — drop them without the O(k log k) re-sort (equal-to-boundary
    // pairs are value-identical, so dropping preserves the result)
    if (buf.size >= k && ord.compare(v, buf.last) >= 0) buf
    else trim(buf :+ v)

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()

  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
