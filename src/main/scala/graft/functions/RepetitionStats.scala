package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition counters over a token array — the exact integer
  * inputs of the repetition-signal fractions, fused into a single
  * hash-pass per document. The composable-builtins spelling
  * (`array_max(transform(array_distinct(ws), w -> size(filter(ws, _ ===
  * w))))`) is O(distinct · n) STRING comparisons per document through
  * interpreted CodegenFallback higher-order lambdas — measured as the
  * whole cost of `q_repetition_signals` at sf0.1; this pass is O(n)
  * hash operations inside whole-stage codegen.
  *
  * Returns exact counts only (`max_unigram`, `distinct_bigrams`, …);
  * the FRACTIONS stay spelled in Catalyst column arithmetic by the
  * caller, in the same cast/division order as before, so every derived
  * double is bit-identical to the previous spelling and to the DuckDB
  * oracle.
  */
object RepetitionStatsUtil {
  /** (n_tokens, max unigram count, distinct adjacent-bigram count,
    * bigram count = n−1 (0 when n == 0), Σ per-token char length).
    * Bigrams are the space-joined adjacent token pairs — tokens contain
    * no whitespace, so the join is injective and the distinct count
    * equals the distinct count over pairs.
    */
  def stats(ws: ArrayData): InternalRow = {
    val n = ws.numElements()
    val counts = new java.util.HashMap[UTF8String, Int]()
    val bigrams = new java.util.HashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var maxCount = 0L
    var sumLen = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val w = ws.getUTF8String(i)
      sumLen += w.numChars()
      val c = counts.merge(w, 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      if (prev != null) bigrams.add(UTF8String.concat(prev, space, w))
      prev = w
      i += 1
    }
    InternalRow(n.toLong, maxCount, bigrams.size.toLong,
      if (n == 0) 0L else (n - 1).toLong, sumLen)
  }
}

/** Native fused repetition counters over an `array<string>` token column
  * -> struct<n_tokens, max_unigram, distinct_bigrams, n_bigrams,
  * sum_word_len> (all bigint).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("max_unigram", LongType, nullable = false),
    StructField("distinct_bigrams", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false)))

  override def prettyName: String = "graft_repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(ws: Any): Any =
    RepetitionStatsUtil.stats(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      ws => s"graft.functions.RepetitionStatsUtil.stats($ws)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
