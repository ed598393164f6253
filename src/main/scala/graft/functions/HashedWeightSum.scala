package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass hashed-feature weight sum over a token array — the
  * fastText-inference inner loop shared by the quality classifier and
  * DSIR importance weighting (CurationOps). The builtins spelling
  * (`aggregate(ws, 0L, acc + f(md5(t)))`) evaluates through an
  * interpreted lambda that re-computes md5 TWICE per token (the two
  * `substring(md5(t), …)` reads of the bucket formula are separate
  * expression-tree copies; interpreted eval has no subexpression
  * elimination) and round-trips a 32-char hex string per hash. This
  * pass digests each token once and derives the bucket from the first
  * byte's hex-CHAR codes directly — bit-identical to
  * `(ascii(substr(md5(t),1,1))·16 + ascii(substr(md5(t),2,1))) % dim`
  * (property-checked in FilterExprsSpec).
  */
object HashedWeightSumUtil {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  // ASCII codes of lowercase hex digits — what ascii(substr(hex, k, 1))
  // sees on both engines (Spark and DuckDB md5 both print lowercase)
  private val Hex = "0123456789abcdef".toCharArray

  // shared by HashedBucketCounts so the training histogram and the
  // scoring sum use bit-identical bucket arithmetic
  private[functions] def digest(): java.security.MessageDigest = md.get()
  private[functions] def bucketOf(b0: Int, dim: Int): Int =
    (Hex(b0 >>> 4) * 16 + Hex(b0 & 0xF)) % dim

  /** Null-propagating like the builtins reference: a null token makes
    * the whole sum NULL (`acc + md5(null)` nulls the aggregate), so the
    * SQL-exposed form agrees with the spelling it claims parity with.
    * Returns boxed Long; null marks the null-token case.
    */
  def sum(ws: ArrayData, weights: Array[Long], dim: Int): java.lang.Long = {
    val digest = md.get()
    var s = 0L
    var i = 0
    val n = ws.numElements()
    while (i < n) {
      if (ws.isNullAt(i)) return null
      digest.reset()
      val h = digest.digest(ws.getUTF8String(i).getBytes)
      val b0 = h(0) & 0xFF
      s += weights(bucketOf(b0, dim))
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** `graft_hashed_weight_sum(ws)` with a literal weight table (model
  * state baked into the plan, the NearestCentroid policy) -> BIGINT
  * Σ weights[md5-bucket(token)].
  */
case class HashedWeightSum(child: Expression, weights: Seq[Long])
    extends UnaryExpression {
  require(weights.nonEmpty, "HashedWeightSum needs a non-empty weight table")

  private val weightArr = weights.toArray
  private val dim = weights.size

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hashed_weight_sum"
  // nullable: null input array (UnaryExpression handles) OR a null
  // token element (the Util propagates it)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(ws: Any): Any =
    HashedWeightSumUtil.sum(ws.asInstanceOf[ArrayData], weightArr, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hwsWeights", weightArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("hwsTmp")
      s"""
         |java.lang.Long $tmp = graft.functions.HashedWeightSumUtil.sum($c, $wRef, $dim);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWeightSum =
    copy(child = newChild)
}

object HashedBucketCountsUtil {
  /** Per-document md5-bucket occurrence counts in one fused pass —
    * the histogram-TRAINING sibling of [[HashedWeightSumUtil.sum]]
    * (same digest, same hex-ascii bucket arithmetic, so the counts
    * this emits are exactly what the explode + bucketOf + groupBy
    * spelling aggregates). Null token propagates null like the
    * builtins reference.
    */
  def counts(ws: ArrayData, dim: Int): ArrayData = {
    val digest = HashedWeightSumUtil.digest()
    val out = new Array[Long](dim)
    var i = 0
    val n = ws.numElements()
    while (i < n) {
      if (ws.isNullAt(i)) return null
      digest.reset()
      val h = digest.digest(ws.getUTF8String(i).getBytes)
      val b0 = h(0) & 0xFF
      out(HashedWeightSumUtil.bucketOf(b0, dim)) += 1L
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(java.lang.Long.valueOf(_): AnyRef))
  }
}

/** `graft_hashed_bucket_counts(ws)` -> array<bigint>[dim] of per-doc
  * md5-bucket token counts: the corpus-histogram pass of DSIR-style
  * importance weighting fused into one codegen scan (no per-token
  * explode rows; the downstream aggregation sums dim-slot arrays).
  */
case class HashedBucketCounts(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1, s"HashedBucketCounts needs dim >= 1, got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_bucket_counts"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(ws: Any): Any =
    HashedBucketCountsUtil.counts(ws.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("hbcTmp")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.HashedBucketCountsUtil.counts($c, $dim);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedBucketCounts =
    copy(child = newChild)
}

object BucketDotUtil {
  /** Σ counts[i]·weights[i] over a dim-slot count array. The array is
    * produced by [[HashedBucketCountsUtil.counts]] (containsNull=false),
    * so no per-element null check is needed; a shorter-than-dim array
    * fails loudly rather than silently truncating the dot product.
    */
  def dot(counts: ArrayData, weights: Array[Long]): Long = {
    val n = weights.length
    require(counts.numElements() == n,
      s"graft_bucket_dot: count array has ${counts.numElements()} slots, " +
        s"weight table has $n")
    var s = 0L
    var i = 0
    while (i < n) { s += counts.getLong(i) * weights(i); i += 1 }
    s
  }
}

/** `graft_bucket_dot(bc)` with a literal weight table -> BIGINT
  * Σ bc[i]·weights[i]: the SCORING half of DSIR-style importance
  * weighting when the per-document bucket-count arrays from
  * [[HashedBucketCounts]] are already materialized. Integer-identical
  * to re-running [[HashedWeightSum]] over the token array (Σ_tokens
  * w[bucket(t)] = Σ_b count_b·w_b) — parity property-checked in
  * FilterExprsSpec — but reads 64 longs per document instead of
  * re-tokenizing and re-digesting every token.
  */
case class BucketDot(child: Expression, weights: Seq[Long])
    extends UnaryExpression {
  require(weights.nonEmpty, "BucketDot needs a non-empty weight table")

  private val weightArr = weights.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bucket_dot"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(bc: Any): Any =
    BucketDotUtil.dot(bc.asInstanceOf[ArrayData], weightArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bdWeights", weightArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BucketDotUtil.dot($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketDot =
    copy(child = newChild)
}
