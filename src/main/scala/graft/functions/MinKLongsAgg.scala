package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "smallest k longs per group" aggregate — the shuffle-friendly
  * replacement for "row_number over the group, keep rn <= k, then
  * collect": one hash aggregation instead of a window sort + regroup, and
  * the partial buffers never exceed 2k values, so a degenerate group
  * (every row in one bucket) costs O(k) memory instead of O(group).
  * Map-side partials shrink each partition's contribution to k values
  * before the exchange.
  *
  * The trim is amortized: buffers grow to 2k before an O(k log k) sort
  * cuts them back to k, so per-input cost is O(1) amortized comparisons.
  * Output is sorted ascending. Comparison-only — exactly deterministic
  * and oracle-checkable. Used by the LSH bucket cap
  * (ops.DedupOps.lshCandidatePairs).
  */
class MinKLongsAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  def zero: Seq[Long] = Seq.empty

  private def trim(s: Seq[Long]): Seq[Long] =
    if (s.length <= k) s else s.sorted.take(k)

  def reduce(buf: Seq[Long], v: Long): Seq[Long] = {
    val s = buf :+ v
    if (s.length >= 2 * k) trim(s) else s
  }

  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)

  def finish(r: Seq[Long]): Seq[Long] = r.sorted.take(k)

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
