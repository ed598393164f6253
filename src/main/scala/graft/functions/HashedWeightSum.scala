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

  def sum(ws: ArrayData, weights: Array[Long], dim: Int): Long = {
    val digest = md.get()
    var s = 0L
    var i = 0
    val n = ws.numElements()
    while (i < n) {
      digest.reset()
      val h = digest.digest(ws.getUTF8String(i).getBytes)
      val b0 = h(0) & 0xFF
      val bucket = (Hex(b0 >>> 4) * 16 + Hex(b0 & 0xF)) % dim
      s += weights(bucket)
      i += 1
    }
    s
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

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(ws: Any): Any =
    HashedWeightSumUtil.sum(ws.asInstanceOf[ArrayData], weightArr, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hwsWeights", weightArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashedWeightSumUtil.sum($c, $wRef, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWeightSum =
    copy(child = newChild)
}
