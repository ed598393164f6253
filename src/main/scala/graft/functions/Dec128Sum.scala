package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType, StructField, StructType}

/** Exact decimal(38,10) sum with a TWO-PRIMITIVE-LONG accumulator.
  *
  * `sum(cast(x as decimal(38,10)))` is the engine's cross-engine
  * determinism recipe (Exact.dsum), but Spark's decimal Sum accumulates
  * through BigDecimal for precision > 18 — object allocations and an
  * arbitrary-precision add PER ROW PER AGGREGATE, measured as 2/3 of
  * TPC-H Q1's entire runtime at sf0.1. This aggregate keeps the exact
  * same VALUE while accumulating in primitive longs:
  *
  *  - the child is the decimal(38,10) CAST of the input (the callers in
  *    Exact spell `c.cast(Dec)`), so the double→decimal conversion
  *    semantics are exactly the previous Sum-based form's — evaluated
  *    ONCE per row (imperative update, not a declarative expression
  *    tree that re-evaluates the cast per reference);
  *  - the per-value unscaled integer (|x| < 10^8 required — far above
  *    every per-row value in this suite; beyond it fails loudly with
  *    remediation, see [[Dec128]]) accumulates as hi·10^18 + lo with
  *    lo ∈ [0, 10^18): one conditional carry step per update/merge, no
  *    division, no objects, a fixed-width two-long buffer that stays on
  *    the HashAggregate fast path;
  *  - the exact decimal(38,10) total is reconstructed once per GROUP.
  *    Integer arithmetic is exact in both spellings, so results are
  *    bit-identical to Spark's decimal Sum and to the DuckDB
  *    `SUM(CAST(x AS DECIMAL(38,10)))` oracle.
  *
  * Overflow posture: the two-long range is ±9.2e36 (37 digits) —
  * reaching it needs ~1e21 max-magnitude rows, the same regime where
  * Spark's own decimal(38) sum overflows. The per-VALUE bound is the
  * real contract and it fails loudly.
  *
  * Works in GROUP BY aggregation (HashAggregate, partial + final) and
  * OVER windows (AggregateProcessor drives ImperativeAggregate
  * directly) — the windowed form re-aggregates each frame, so the
  * per-row BigDecimal saving compounds there.
  */
object Dec128 {
  val Radix = 1000000000000000000L // 10^18

  /** Per-value unscaled bound: ONE radix unit, i.e. |x| < 10^8. The
    * single-conditional carry step in [[Dec128SumAgg.add]] is only
    * correct when every addend is a single radix unit (lo + v then
    * stays in (−Radix, 2·Radix) with no long overflow); a larger bound
    * would need per-row division and overflow-checked adds in the hot
    * loop. Every per-row value in this suite is orders of magnitude
    * below 10^8.
    */
  private def checked(bd: java.math.BigDecimal): Long = {
    val v =
      try bd.unscaledValue().longValueExact()
      catch { case _: ArithmeticException => fail(bd) }
    if (v >= Radix || v <= -Radix) fail(bd) else v
  }

  private def fail(bd: java.math.BigDecimal): Nothing =
    throw new ArithmeticException(
      s"Exact.dsum: |value| = ${bd.abs} >= 1e8 exceeds the two-long " +
        "accumulator's per-value range; sum this column with " +
        "Exact.dsumWide (the BigDecimal spelling, any magnitude) instead")

  /** Unscaled long of a decimal(38,10) value; fails loudly past the
    * per-value bound instead of returning a wrong sum.
    */
  def unscaled(d: Decimal): Long = checked(d.toJavaBigDecimal)

  /** The canonical cast(double as decimal(38,10)) conversion —
    * BigDecimal.valueOf (shortest-repr, Spark's Cast semantics) then
    * setScale(10, HALF_UP) — straight to the checked unscaled long.
    *
    * Fast path (no BigDecimal): when |d| < 2^17 and r = rint(d·1e10)
    * round-trips (r/1e10 == d, evaluated in double), the result is
    * provably r. Proof sketch: the round-trip pins the 10-decimal grid
    * point r·10^-10 within ulp(d)/2 of d, and the shortest decimal
    * representation v_s of d (what valueOf renders) is also within
    * ulp(d)/2 — so |v_s − r·10^-10| ≤ ulp(d) ≤ 2^(16−52) ≈ 1.5e-11
    * (the largest ulp below 2^17 is that of [2^16, 2^17)), well under
    * the 5e-11 HALF_UP tie radius of the 1e-10 grid.
    * HALF_UP(v_s, 10) therefore lands on r, never a neighbor and never
    * a tie. Values that fail either guard (large magnitudes, genuine
    * >10-decimal doubles like price products) take the BigDecimal
    * path; clean money-style columns skip it entirely.
    * Dec128SumSpec cross-checks the two paths on millions of samples
    * including tie-zone adversaries.
    */
  def unscaledFromDouble(d: Double): Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new ArithmeticException(
        s"Exact.dsum: non-finite value $d cannot be cast to decimal(38,10)")
    if (d > -131072.0 && d < 131072.0) {
      val r = Math.rint(d * 1e10)
      if (r / 1e10 == d) return r.toLong
    }
    checked(java.math.BigDecimal.valueOf(d)
      .setScale(10, java.math.RoundingMode.HALF_UP))
  }

  /** The reference (BigDecimal-only) spelling of [[unscaledFromDouble]],
    * exposed for the cross-check spec.
    */
  def unscaledFromDoubleReference(d: Double): Long =
    checked(java.math.BigDecimal.valueOf(d)
      .setScale(10, java.math.RoundingMode.HALF_UP))

  def toDecimal(hi: Long, lo: Long): Decimal =
    Decimal(new java.math.BigDecimal(
      java.math.BigInteger.valueOf(hi)
        .multiply(java.math.BigInteger.valueOf(Radix))
        .add(java.math.BigInteger.valueOf(lo)), 10), 38, 10)
}

case class Dec128SumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends ImperativeAggregate {

  import Dec128.Radix

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 10)
  override def prettyName: String = "graft_dec128_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): Dec128SumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Dec128SumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Dec128SumAgg =
    copy(child = newChildren.head)

  // hi is nullable and doubles as the "saw any value" flag (SQL sum of
  // an all-null group is null); lo is always present.
  override def aggBufferSchema: StructType = StructType(Seq(
    StructField("hi", LongType, nullable = true),
    StructField("lo", LongType, nullable = false)))

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(
    AttributeReference("hi", LongType, nullable = true)(),
    AttributeReference("lo", LongType, nullable = false)())

  override lazy val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())

  override def initialize(buffer: InternalRow): Unit = {
    buffer.setNullAt(mutableAggBufferOffset)
    buffer.setLong(mutableAggBufferOffset + 1, 0L)
  }

  /** Accumulate (hiNew could carry ±1). |v| < Radix and lo ∈ [0, Radix),
    * so raw ∈ (−Radix, 2·Radix) and one conditional step renormalizes.
    */
  private def add(buffer: InternalRow, hi: Long, v: Long): Unit = {
    val raw = buffer.getLong(mutableAggBufferOffset + 1) + v
    if (raw < 0L) {
      buffer.setLong(mutableAggBufferOffset, hi - 1L)
      buffer.setLong(mutableAggBufferOffset + 1, raw + Radix)
    } else if (raw >= Radix) {
      buffer.setLong(mutableAggBufferOffset, hi + 1L)
      buffer.setLong(mutableAggBufferOffset + 1, raw - Radix)
    } else {
      buffer.setLong(mutableAggBufferOffset, hi)
      buffer.setLong(mutableAggBufferOffset + 1, raw)
    }
  }

  // When the child is the canonical `cast(double as decimal(38,10))`
  // spelling, skip the interpreted Cast + Decimal wrapper per row and
  // convert inside update with the IDENTICAL arithmetic (Spark's cast is
  // Decimal(BigDecimal.valueOf(d)).changePrecision(38, 10) — i.e.
  // valueOf + setScale(10, HALF_UP); replicated below). Interpreted
  // expression eval of the cast measured ~40% of Q1's aggregation job.
  private lazy val doubleInner: Option[Expression] = child match {
    case c: org.apache.spark.sql.catalyst.expressions.Cast
        if c.dataType == DecimalType(38, 10) &&
          c.child.dataType == org.apache.spark.sql.types.DoubleType =>
      Some(c.child)
    case _ => None
  }

  override def update(buffer: InternalRow, input: InternalRow): Unit = {
    doubleInner match {
      case Some(inner) =>
        val d = inner.eval(input)
        if (d != null) {
          val hi = if (buffer.isNullAt(mutableAggBufferOffset)) 0L
            else buffer.getLong(mutableAggBufferOffset)
          add(buffer, hi, Dec128.unscaledFromDouble(d.asInstanceOf[Double]))
        }
      case None =>
        val d = child.eval(input)
        if (d != null) {
          val hi = if (buffer.isNullAt(mutableAggBufferOffset)) 0L
            else buffer.getLong(mutableAggBufferOffset)
          add(buffer, hi, Dec128.unscaled(d.asInstanceOf[Decimal]))
        }
    }
  }

  override def merge(buffer: InternalRow, inputBuffer: InternalRow): Unit = {
    if (!inputBuffer.isNullAt(inputAggBufferOffset)) {
      val hi = (if (buffer.isNullAt(mutableAggBufferOffset)) 0L
        else buffer.getLong(mutableAggBufferOffset)) +
        inputBuffer.getLong(inputAggBufferOffset)
      add(buffer, hi, inputBuffer.getLong(inputAggBufferOffset + 1))
    }
  }

  override def eval(buffer: InternalRow): Any =
    if (buffer.isNullAt(mutableAggBufferOffset)) null
    else Dec128.toDecimal(
      buffer.getLong(mutableAggBufferOffset),
      buffer.getLong(mutableAggBufferOffset + 1))
}
