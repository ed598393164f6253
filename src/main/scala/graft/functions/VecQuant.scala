package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Runtime for the fused vector-quantization / norm expressions: ONE
  * primitive pass over the array where the builtin spelling was a stack
  * of interpreted higher-order functions (`transform` + `aggregate` +
  * `array_max` are CodegenFallback — each evaluates a boxed lambda per
  * element, and Catalyst's filter pushdown duplicates the whole stack
  * into Filter AND Project). Measured on q_embed_dedup at sf0.1: the
  * quantize projection alone cost ~2.0 s per pair-join side (the
  * BroadcastExchange build collectTime) for 5000 rows — the dominant
  * stage of every SemDeDup-family query. Every arithmetic step below
  * replicates the fold spelling bit for bit (same left-fold order, same
  * IEEE ops, same null propagation), so results are identical and the
  * DuckDB oracles are untouched.
  */
object VecQuantUtil {

  /** Exact replica of Spark's `round(y, 0)` + ANSI `cast(tinyint)` for
    * |y| <= 127: HALF_UP on the shortest-decimal value. A tie (decimal
    * .5) occurs iff y == floor(y) + 0.5 exactly in binary, because
    * d.5 is itself representable: a shortest-repr decimal and its
    * double can never straddle a representable boundary (the string
    * would then round-trip to a double on the boundary's far side).
    * NaN (x = Inf input makes y = Inf*127/Inf) throws — the ANSI cast
    * parity; the builtin spelling throws SparkArithmeticException on
    * the same inputs.
    */
  private def roundHalfUpToByte(y: Double): Byte = {
    val fl = math.floor(y)
    val diff = y - fl // exact: |y| <= 127 leaves >= 45 fraction bits
    val r =
      if (diff > 0.5) fl + 1.0
      else if (diff < 0.5) fl
      else if (y > 0) fl + 1.0 // decimal HALF_UP: ties away from zero
      else fl
    if (java.lang.Double.isNaN(r) || r < -128.0 || r > 127.0)
      throw new ArithmeticException(
        s"graft_int8_quant: $y out of tinyint range (ANSI cast parity)")
    r.toByte
  }

  /** struct<qv: array<tinyint>, qeps: double, nrm: double> in one pass —
    * the [[graft.ops.MlOps]] semantic-dedup quantize projection:
    *   qv   = when(maxAbs > 0, round(v*127/maxAbs)::tinyint)
    *            .otherwise(zeros)
    *   qeps = when(nrm > 0, sqrt(size)*maxAbs/254/nrm).otherwise(Inf)
    *   nrm  = sqrt(aggregate(emb, 0.0, (a,x) => a + x*x))
    * Null-element rows surface nrm = null (the fold spelling's null
    * propagation), which the caller's `nrm > 0` filter excludes exactly
    * as before; NaN elements surface nrm = NaN (filtered the same way,
    * Java `>` parity with Spark's codegen GreaterThan).
    */
  def quantMeta(e: ArrayData): InternalRow = {
    val n = e.numElements()
    var i = 0
    while (i < n) {
      if (e.isNullAt(i))
        return new GenericInternalRow(
          Array[Any](null, Double.PositiveInfinity, null))
      i += 1
    }
    var seen = false
    var maxAbs = 0.0
    var ss = 0.0
    i = 0
    while (i < n) {
      val x = e.getFloat(i).toDouble
      val ax = math.abs(x)
      // Double.compare orders NaN greatest — array_max parity
      if (!seen || java.lang.Double.compare(ax, maxAbs) > 0) {
        maxAbs = ax; seen = true
      }
      ss += x * x
      i += 1
    }
    val nrm = math.sqrt(ss)
    val qv: ArrayData =
      if (seen && maxAbs > 0.0) {
        val bytes = new Array[Byte](n)
        i = 0
        while (i < n) {
          bytes(i) = roundHalfUpToByte(e.getFloat(i).toDouble * 127.0 / maxAbs)
          i += 1
        }
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(bytes)
      } else {
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(new Array[Byte](n))
      }
    val qeps =
      if (nrm > 0.0) math.sqrt(n.toDouble) * maxAbs / 254.0 / nrm
      else Double.PositiveInfinity
    new GenericInternalRow(Array[Any](qv, qeps, nrm))
  }

  /** Σ x² over an array<float> in double (left fold from 0.0 — the
    * `aggregate(e, 0.0, (a,x) => a + x*x)` zero-norm guard). Null on a
    * null element (the fold's null propagation); boxed for that reason.
    */
  def sqNormF(e: ArrayData): java.lang.Double = {
    val n = e.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (e.isNullAt(i)) return null
      val x = e.getFloat(i).toDouble
      ss += x * x
      i += 1
    }
    ss
  }

  /** sqrt(Σ x² in EXACT long) over an array<bigint> — the embed-family
    * norm column (`sqrt(aggregate(cnts, 0L, (a,x) => a + x*x)::double)`).
    * Long overflow throws (the ANSI-guard parity: loud, never wraps);
    * null on a null element.
    */
  def sqNormCounts(e: ArrayData): java.lang.Double = {
    val n = e.numElements()
    var ss = 0L
    var i = 0
    while (i < n) {
      if (e.isNullAt(i)) return null
      val x = e.getLong(i)
      ss = Math.addExact(ss, Math.multiplyExact(x, x))
      i += 1
    }
    math.sqrt(ss.toDouble)
  }

  /** L2-normalize an array<bigint> count vector into array<float> —
    * [[sqNormCounts]] fused with the divide/cast projection:
    * when(nrm > 0, (c/nrm)::float).otherwise(zeros). A null element
    * nulls the norm in the fold spelling, which lands every position in
    * the `otherwise` zeros branch — mirrored here.
    */
  def l2NormCounts(e: ArrayData): ArrayData = {
    val n = e.numElements()
    var ok = true
    var ss = 0L
    var i = 0
    while (i < n && ok) {
      if (e.isNullAt(i)) ok = false
      else {
        val x = e.getLong(i)
        ss = Math.addExact(ss, Math.multiplyExact(x, x))
      }
      i += 1
    }
    val out = new Array[Float](n)
    if (ok && ss > 0L) {
      val nrm = math.sqrt(ss.toDouble)
      i = 0
      while (i < n) {
        out(i) = (e.getLong(i).toDouble / nrm).toFloat
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Fused int8 quantization + adaptive prefilter bound + L2 norm over an
  * `array<float>` embedding — struct<qv, qeps, nrm> in one codegen pass.
  * The hot projection of the SemDeDup pair machinery (SURVEY.md §2C);
  * see [[VecQuantUtil.quantMeta]] for the exact spelling it replaces.
  */
case class Int8Quant(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("qv", ArrayType(ByteType, containsNull = false),
      nullable = true),
    StructField("qeps", DoubleType, nullable = false),
    StructField("nrm", DoubleType, nullable = true)))
  override def prettyName: String = "graft_int8_quant"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(e: Any): Any =
    VecQuantUtil.quantMeta(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.VecQuantUtil.quantMeta($e)")

  override protected def withNewChildInternal(newChild: Expression): Int8Quant =
    copy(child = newChild)
}

/** Σ x² over an `array<float>` — the codegen zero-norm guard (a zero
  * vector is similar to nothing; see the semanticDedup NaN rationale).
  */
case class SqNormF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq_norm_f"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(e: Any): Any =
    VecQuantUtil.sqNormF(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val tmp = ctx.freshName("sqnTmp")
      s"""
         |java.lang.Double $tmp = graft.functions.VecQuantUtil.sqNormF($e);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SqNormF =
    copy(child = newChild)
}

/** sqrt(Σ x² exact in long) over an `array<bigint>` — the embed-family
  * norm column, codegen (overflow throws; ANSI-guard parity).
  */
case class SqNormCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq_norm_counts"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(e: Any): Any =
    VecQuantUtil.sqNormCounts(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val tmp = ctx.freshName("sqcTmp")
      s"""
         |java.lang.Double $tmp = graft.functions.VecQuantUtil.sqNormCounts($e);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SqNormCounts =
    copy(child = newChild)
}

/** L2-normalized `array<float>` from an `array<bigint>` count vector —
  * the fused tail of embedFromText/imageEmbed/audioEmbed (exact long
  * Σc², IEEE sqrt/divide, float cast — bit-identical to the fold
  * spelling and to the analytic oracles).
  */
case class L2NormCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_l2_norm_counts"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(e: Any): Any =
    VecQuantUtil.l2NormCounts(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.VecQuantUtil.l2NormCounts($e)")

  override protected def withNewChildInternal(newChild: Expression): L2NormCounts =
    copy(child = newChild)
}
