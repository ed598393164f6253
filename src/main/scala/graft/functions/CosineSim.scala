package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen helper for [[CosineSim]]: dot product and both norms in ONE
  * pass over the two float arrays — no per-element product array like
  * `zip_with` + three separate `aggregate` folds. Accumulation order is
  * the same left fold (0.0 + x == x), so results are bit-identical to the
  * fold spelling and to DuckDB's list_reduce oracle.
  */
object CosineSimUtil {
  /** Null (boxed) on length mismatch — matching the zip_with/oracle
    * spelling, where indexing past the shorter array nulls the result —
    * instead of silently truncating to the shorter vector.
    */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** [[cosine]] over two `array<tinyint>` columns (int8-quantized
    * vectors). int8→double is exact and every product magnitude is
    * ≤ 127² with ≤ array-length terms, so the double accumulation is
    * exact integer arithmetic — the result is bit-identical to casting
    * the quantized vectors to float first, without materializing two
    * float arrays per compared pair (the cast spelling forces an
    * interpreted higher-order `transform` into the pair loop:
    * CodegenFallback, two array allocations and 2·n boxed casts per
    * pair — measured 5× the entire pair-stage cost at sf0.1).
    */
  def cosineI8(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toDouble
      val y = b.getByte(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native cosine similarity over two `array<float>` columns (SURVEY.md
  * §2C similarity search) — the hot inner loop of top-k search at 100 TB,
  * kept inside whole-stage codegen via a single static call.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim"

  // The expression can produce null for non-null children (length
  // mismatch), so it must always advertise nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // Not defineCodeGen: cosine() returns a boxed Double that is null on
  // array-length mismatch, so the generated code must route through a
  // boxed temp and set ev.isNull rather than auto-unbox into a primitive
  // (which would NPE under whole-stage codegen).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosTmp")
      s"""
         |java.lang.Double $tmp = graft.functions.CosineSimUtil.cosine($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** [[CosineSim]] over `array<tinyint>` (int8-quantized) vectors — the
  * candidate-prefilter hot loop of semantic dedup, kept inside
  * whole-stage codegen with byte accessors so the quantized pair join
  * never materializes float copies of its payload.
  */
case class CosineSimI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim_i8"

  override def nullable: Boolean = true

  // getByte on a non-tinyint array reads a byte slice of the packed
  // element region — structurally valid garbage; reject at analysis
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<tinyint> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimUtil.cosineI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosTmp")
      s"""
         |java.lang.Double $tmp = graft.functions.CosineSimUtil.cosineI8($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimI8 =
    copy(left = newLeft, right = newRight)
}
