package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2B UDF/UDAF row, §7.3): bounded top-k values per
  * group without a window — the buffer holds at most k doubles, so the
  * partial/final merge is O(k) per input regardless of group size. At
  * 100 TB this replaces "sort the whole group to keep 5 rows": map-side
  * partials shrink each partition's contribution to k values before the
  * shuffle.
  *
  * Comparison-only (no float arithmetic), so results are exactly
  * deterministic and oracle-checkable.
  */
class TopKAgg(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {

  def zero: Seq[Double] = Seq.empty

  private def trim(s: Seq[Double]): Seq[Double] =
    s.sorted(Ordering[Double].reverse).take(k)

  def reduce(buf: Seq[Double], v: Double): Seq[Double] = trim(buf :+ v)

  def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = trim(a ++ b)

  def finish(r: Seq[Double]): Seq[Double] = trim(r)

  def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
