package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine deterministic numeric helpers.
  *
  * Floating-point aggregation is order-dependent, and Spark and DuckDB do
  * not sum partitions in the same order — a plain `sum(double)` would
  * hash-mismatch the oracle in the low bits. The fix: cast each double to
  * DECIMAL(38,10) (deterministic per-value), sum exactly in decimal
  * (order-independent), and cast the final total back to double
  * (nearest-double of an exact decimal, identical in both engines).
  *
  * The DuckDB side of each helper is the SQL fragment documented next to
  * it; both sides must be kept in lock-step.
  */
object Exact {
  private[graft] val Dec = DecimalType(38, 10)

  /** Exact sum of a double expression; DuckDB:
    * `CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE)`.
    *
    * The sum rides [[graft.functions.Dec128SumAgg]] — Spark's own cast
    * does the double→decimal conversion (unchanged semantics), but the
    * accumulation is two primitive longs instead of a BigDecimal per
    * row (Spark's decimal Sum allocates through BigDecimal for
    * precision > 18; measured as 2/3 of TPC-H Q1's runtime at sf0.1).
    * Bit-identical totals; per-VALUE |x| must stay under 1e8 — one
    * radix unit of the two-long accumulator (fails loudly naming
    * [[dsumWide]] — every suite column is orders below; squared prices
    * are not and ride dsumWide).
    */
  def dsum(c: Column): Column = decSum(c).cast("double")

  /** [[dsum]] without the two-long fast path — Spark's BigDecimal-backed
    * decimal Sum, value-identical, for inputs whose per-VALUE magnitude
    * can reach or exceed 10^8 (e.g. squared prices in the moment
    * queries: a 2e5 price squares to 4e10, whose unscaled value does
    * not even fit a long). [[dsum]] fails loudly and names this
    * spelling when a value trips its bound.
    */
  def dsumWide(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact-numerator average; DuckDB:
    * `CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / COUNT(x)`.
    * The final double division is IEEE-identical in both engines.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Windowed exact sum: `sum(c.cast(dec)).over(w).cast("double")` on the
    * Spark side; `CAST(SUM(CAST(x AS DECIMAL(38,10))) OVER w AS DOUBLE)` in
    * DuckDB. Exposed as the casted column for symmetry. Same two-long
    * accumulator as [[dsum]] (windowed frames re-aggregate per row, so
    * the per-row BigDecimal saving compounds there).
    */
  def decSum(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.Dec128SumAgg(
        org.apache.spark.sql.GraftBridge.expression(c.cast(Dec)))
        .toAggregateExpression())

  /** Portable 6-decimal rounding: `floor(x*1e6 + 0.5)/1e6`, spelled
    * identically on BOTH engines. The `round()` builtins disagree on
    * .5-boundary doubles (Spark rounds HALF_UP over the shortest decimal
    * representation, DuckDB rounds the exact binary expansion — observed
    * as a 1e-6 divergence on a q_tpch_q9 group), while this spelling is
    * the same IEEE mul/add/floor/divide sequence everywhere, and the
    * resulting ≤6-decimal double converts to DECIMAL identically in both
    * engines. Use it wherever a 6-decimal-rounded double feeds the hash
    * compare. DuckDB: `floor(x*1e6 + 0.5)/1e6`.
    */
  def round6(c: Column): Column = roundN(c, 6)

  /** [[round6]] at an arbitrary decimal count; DuckDB:
    * `floor(x*1eN + 0.5)/1eN`.
    *
    * Guards, in cross-engine terms (DuckDB's floor preserves doubles,
    * Spark's `floor(double)` returns a LONG — NaN → 0, ±Inf →
    * Long.Min/MaxValue, any product beyond ±2^63 saturates there):
    *
    *  - NaN and ±Inf PASS THROUGH. The plain DuckDB spelling already
    *    yields NaN/±Inf for them (`NaN*1eN = NaN`, `floor(NaN) = NaN`,
    *    `Inf/1eN = Inf`), so pass-through keeps the two engines
    *    IDENTICAL with no oracle-side guard needed — while Spark's
    *    unguarded floor would have turned a NaN z-score into 0.0.
    *  - a FINITE |x| ≥ 2^63/1eN FAILS LOUDLY (`raise_error`). Such a
    *    double carries no N-th decimal (ulp(9.2e12) ≈ 2e-3 at N=6),
    *    and no spelling agrees across engines up there: Spark's floor
    *    saturates, and DuckDB's multiply/divide round-trip returns x
    *    only to ±1 ulp — a silent hash flip either way. No output in
    *    this suite is within orders of magnitude of the bound (ratios,
    *    logs, per-row amounts — corpus-scale totals ride [[dsum]]
    *    unrounded); a future query that trips this needs fewer digits
    *    or an unrounded spelling, and the error names that.
    */
  def roundN(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    val saturates = math.pow(2.0, 63) / p
    when(isnan(c) || abs(c) === lit(Double.PositiveInfinity), c)
      .when(abs(c) >= lit(saturates),
        raise_error(concat(
          lit(s"Exact.roundN($digits): |"), c.cast("string"),
          lit(s"| >= $saturates saturates Spark's floor(double) and " +
            "diverges from the DuckDB floor spelling by 1 ulp — " +
            "round at fewer digits or leave the column unrounded"))))
      .otherwise(floor(c * lit(p) + lit(0.5)) / lit(p))
  }

  /** Sample variance/stddev built only from exact decimal sums plus IEEE
    * double arithmetic (Welford-style running aggregates are NOT
    * cross-engine deterministic). DuckDB mirror:
    * `(sum_x2 - sum_x * sum_x / n) / (n - 1)` with the same parentheses.
    */
  def dvarSamp(sumX: Column, sumX2: Column, n: Column): Column =
    (sumX2 - sumX * sumX / n) / (n - lit(1))
}
