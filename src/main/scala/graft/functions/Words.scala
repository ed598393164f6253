package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenizer shared by the [[Words]] and [[Shingles]] expressions.
  * Splitting semantics are Go `strings.Fields` parity (reference
  * `/root/reference/main.go:195`): runs of Unicode whitespace separate
  * tokens, empty tokens never appear. Equal by construction to the
  * built-ins spelling `filter(split(text, WsRe), t => t =!= "")`
  * (property-checked in WordsExprSpec).
  */
object WordsUtil {

  /** Token list of `str` (Go strings.Fields). */
  def tokenize(str: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    var i = 0
    var start = -1
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (WordCountUtil.isGoSpace(cp)) {
        if (start >= 0) { out.add(str.substring(start, i)); start = -1 }
      } else if (start < 0) start = i
      i += Character.charCount(cp)
    }
    if (start >= 0) out.add(str.substring(start))
    out
  }

  def words(s: UTF8String): ArrayData = {
    val toks = tokenize(s.toString)
    val arr = new Array[AnyRef](toks.size)
    var i = 0
    while (i < toks.size) {
      arr(i) = UTF8String.fromString(toks.get(i))
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Space-joined `n`-grams of the token stream: one tokenize pass, then
    * `len - n + 1` builder joins — O(text) instead of the O(text · tokens)
    * an `element_at(split(...), i)`-per-index spelling costs once an
    * optimizer rule (predicate pushdown, InferFiltersFromGenerate) inlines
    * it into a Filter condition. Fewer than `n` tokens -> empty array.
    */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(s.toString)
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val arr = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks.get(i))
      var j = 1
      while (j < n) {
        sb.append(' ').append(toks.get(i + j))
        j += 1
      }
      arr(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** Native codegen tokenizer: `graft_words(text)` -> array of non-empty
  * whitespace-separated tokens (Go `strings.Fields` parity, SURVEY.md
  * §7.4). The hot inner loop of every text-analysis operator — a single
  * compiled call, so plans that duplicate the expression (pushed-down
  * filters over derived columns) stay linear in the text length instead
  * of re-splitting per element access.
  */
case class Words(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_words"

  // reject non-string arguments at ANALYSIS time with a contract-naming
  // message (AbstractDataType/ImplicitCastInputTypes are private[sql],
  // so the check is spelled directly)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordsUtil.words(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordsUtil.words($c)")

  override protected def withNewChildInternal(newChild: Expression): Words =
    copy(child = newChild)
}

/** Native codegen shingler: `graft_shingles(text, n)` -> space-joined
  * word n-grams in one pass (the MinHash/contamination shingle builder).
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING text argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordsUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordsUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}
