package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams + multi-class hashed scoring — the fastText
  * inference shape behind the hashed language classifier
  * (q_lang_id_hashed): hash each char n-gram once, add every class's
  * bucket weight, argmax downstream.
  */
object LangIdUtil {

  /** Code-point n-grams of `s` (CODE POINTS, not UTF-16 units — DuckDB
    * `substr(text, i, n)` slices code points, so parity requires it;
    * fewer than `n` code points → empty array). One pass: code-point
    * start offsets, then `cps - n + 1` substring windows.
    */
  def charNgrams(s: String, n: Int): GenericArrayData = {
    // offsets(k) = UTF-16 index of code point k; offsets(cps) = length
    val offsets = new Array[Int](s.length + 1)
    var cps = 0
    var i = 0
    while (i < s.length) {
      offsets(cps) = i
      i += Character.charCount(s.codePointAt(i))
      cps += 1
    }
    offsets(cps) = s.length
    val m = cps - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](m)
    var k = 0
    while (k < m) {
      out(k) = UTF8String.fromString(s.substring(offsets(k), offsets(k + n)))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Two-byte md5 bucket — the language model needs more than the
    * 256 buckets [[HashedWeightSumUtil.bucketOf]]'s single-byte read
    * can address (at 256 the classifier lost held-out sentences to
    * collisions). Bit-identical to the SQL spelling
    * `((ascii(substr(md5(g),1,1))·16 + ascii(substr(md5(g),2,1)))·256
    *   + ascii(substr(md5(g),3,1))·16 + ascii(substr(md5(g),4,1))) % dim`.
    * The 64-bucket quality/DSIR machinery keeps its own one-byte
    * formula untouched.
    */
  private val Hex = "0123456789abcdef".toCharArray
  @inline private[functions] def wideBucketOf(b0: Int, b1: Int, dim: Int): Int =
    (((Hex(b0 >>> 4) * 16 + Hex(b0 & 0xF)) * 256) +
      Hex(b1 >>> 4) * 16 + Hex(b1 & 0xF)) % dim

  /** Per-doc wide-bucket n-gram histogram: array<bigint>[dim] (the
    * training-side pass; per-language totals ride a LongVecSumAgg).
    */
  def counts(ws: ArrayData, dim: Int): GenericArrayData = {
    val acc = new Array[Long](dim)
    val digest = HashedWeightSumUtil.digest()
    var i = 0
    val n = ws.numElements()
    while (i < n) {
      if (!ws.isNullAt(i)) {
        digest.reset()
        val h = digest.digest(ws.getUTF8String(i).getBytes)
        acc(wideBucketOf(h(0) & 0xFF, h(1) & 0xFF, dim)) += 1L
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** Per-class Σ weights[bucket(token)] in ONE digest pass per token
    * (the [[HashedWeightSumUtil.sum]] discipline, fanned out to every
    * class table — scoring L languages costs one md5 per n-gram, not
    * L). Null token → null result (the spelling-parity contract).
    * All tables share `dim` = tables(0).length.
    */
  def sums(ws: ArrayData, tables: Array[Array[Long]]): GenericArrayData = {
    val nl = tables.length
    val dim = tables(0).length
    val acc = new Array[Long](nl)
    val digest = HashedWeightSumUtil.digest()
    var i = 0
    val n = ws.numElements()
    while (i < n) {
      if (ws.isNullAt(i)) return null
      digest.reset()
      val h = digest.digest(ws.getUTF8String(i).getBytes)
      val b = wideBucketOf(h(0) & 0xFF, h(1) & 0xFF, dim)
      var l = 0
      while (l < nl) { acc(l) += tables(l)(b); l += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }
}

/** `graft_lang_bucket_counts(ws, dim)` -> array<bigint>[dim]: per-row
  * wide-bucket histogram (the training pass of the hashed language
  * classifier; two-byte md5 buckets — see [[LangIdUtil.wideBucketOf]]).
  */
case class LangBucketCounts(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, s"LangBucketCounts needs dim >= 1, got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lang_bucket_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(ws: Any): Any =
    LangIdUtil.counts(ws.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdUtil.counts($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): LangBucketCounts =
    copy(child = newChild)
}

/** `graft_char_ngrams(text, n)` -> array<string>: code-point n-gram
  * windows, bit-identical to the builtins spelling
  * `transform(sequence(1, length(text) - n + 1), i -> substr(text, i, n))`.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"CharNgrams needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    LangIdUtil.charNgrams(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LangIdUtil.charNgrams($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** `graft_hashed_weight_sums(ws)` with L literal weight tables (model
  * state baked into the plan) -> array<bigint>[L] of per-class
  * Σ weights[md5-bucket(token)] — [[HashedWeightSum]] fanned out to
  * every class with ONE digest per token.
  */
case class HashedWeightSums(child: Expression, tables: Seq[Seq[Long]])
    extends UnaryExpression {
  require(tables.nonEmpty, "HashedWeightSums needs >= 1 weight table")
  require(tables.forall(_.size == tables.head.size),
    "HashedWeightSums tables must share one dimension")

  @transient private lazy val tableArr: Array[Array[Long]] =
    tables.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_weight_sums"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(ws: Any): Any =
    LangIdUtil.sums(ws.asInstanceOf[ArrayData], tableArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weightTables", tableArr, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdUtil.sums($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWeightSums =
    copy(child = newChild)
}
