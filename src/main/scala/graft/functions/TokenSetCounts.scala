package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-set token occurrence counts — the language-ID /
  * stopword-signal inner loop. The builtins spelling runs one
  * interpreted `filter(ws, isInCollection(set))` lambda PER SET (the
  * language-ID heuristic runs four), each re-iterating the whole token
  * array through CodegenFallback machinery; this pass iterates the
  * tokens once inside codegen and probes every set per token.
  * Membership is exact string equality, counting OCCURRENCES (not
  * distinct members — that's [[FilterExprsUtil.gopherStats]]'s n_stop).
  */
object TokenSetCountsUtil {
  /** Null ELEMENTS are skipped, matching the builtins spelling exactly:
    * `filter(ws, isInCollection(set))` evaluates the predicate to null
    * for a null token, and ArrayFilter excludes elements with a
    * non-true predicate — so a null token contributes to no set's
    * count. (Only a null ARRAY yields a null result, via the
    * expression's null-safe wrapper.)
    */
  def counts(ws: ArrayData, sets: Array[Array[UTF8String]]): ArrayData = {
    val out = new Array[Long](sets.length)
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val t = ws.getUTF8String(i)
        var si = 0
        while (si < sets.length) {
          val set = sets(si)
          var wi = 0
          var hit = false
          while (wi < set.length && !hit) {
            if (t.equals(set(wi))) hit = true
            wi += 1
          }
          if (hit) out(si) += 1
          si += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.map(java.lang.Long.valueOf(_): AnyRef))
  }
}

/** `graft_token_set_counts(ws)` with literal word sets -> array<bigint>
  * of per-set occurrence counts, one slot per set.
  */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  require(sets.nonEmpty && sets.forall(_.nonEmpty),
    "TokenSetCounts needs >= 1 non-empty word set")

  private val setArr: Array[Array[UTF8String]] =
    sets.map(_.map(UTF8String.fromString).toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_set_counts"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(ws: Any): Any =
    TokenSetCountsUtil.counts(ws.asInstanceOf[ArrayData], setArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("tscSets", setArr,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    // counts() never returns null (null elements are skipped); only a
    // null input array nulls the result, handled by nullSafeCodeGen
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSetCountsUtil.counts($c, $sRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCounts =
    copy(child = newChild)
}
