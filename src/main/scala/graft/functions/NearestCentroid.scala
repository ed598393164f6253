package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Runtime for [[NearestCentroid]]: all K squared distances in one pass
  * over the float array — primitive while-loops, no per-element lambda
  * dispatch (the `zip_with` + `aggregate` fold spelling evaluates an
  * interpreted closure per element: at K=4 × dim=64 that is ~256 lambda
  * frames PER ROW, which measured as the whole cost of the training
  * queries). Accumulation is the same left fold (acc += (x-c)²; 0.0 + x
  * == x), so distances are bit-identical to the fold spelling and to
  * DuckDB's `list_reduce` oracle; ties break to the FIRST (smallest)
  * centroid id because ids are iterated in ascending order under a
  * strict `<` compare — the same pair the oracle's min-join selects.
  */
object NearestCentroidUtil {
  /** Null on dimension mismatch (matching the zip_with spelling, where
    * indexing past the shorter array nulls the fold).
    */
  def nearest(e: ArrayData, mat: Array[Array[Double]], ids: Array[Long]): InternalRow = {
    val n = e.numElements()
    // a null element nulls the whole fold in the zip_with spelling —
    // mirror that instead of silently reading it as 0.0f
    var i0 = 0
    while (i0 < n) {
      if (e.isNullAt(i0)) return null
      i0 += 1
    }
    var best = 0.0
    var bestK = 0L
    var found = false
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      if (c.length != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = e.getFloat(i).toDouble - c(i)
        acc += d * d
        i += 1
      }
      // Double.compare, not `<`: it orders NaN greater than every finite
      // value (a NaN-distance centroid must LOSE to any finite one),
      // matching Spark's total ordering in the array_min fold spelling —
      // a strict `<` would keep a NaN best forever (x < NaN is false)
      if (!found || java.lang.Double.compare(acc, best) < 0) {
        best = acc; bestK = ids(j); found = true
      }
      j += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](best, bestK))
  }
}

/** Native nearest-centroid assignment against a LITERAL K·dim codebook
  * (k-means / IVF coarse quantization, SURVEY.md §2C): input is an
  * `array<float>` embedding, the trained centroid state is baked into
  * the expression, output is `struct<dist: double, k: bigint>` — the
  * minimum squared distance and its centroid id. The hot inner loop of
  * every Lloyd iteration AND of corpus-scale cell assignment, kept
  * inside whole-stage codegen via a single static call.
  *
  * `ids`/`cents` MUST be passed sorted ascending by id for the
  * documented tie-break (smallest id wins on equal distance).
  */
case class NearestCentroid(
    child: Expression, ids: Seq[Long], cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(ids.length == cents.length && ids.nonEmpty,
    s"NearestCentroid needs >= 1 centroid with matching ids " +
      s"(got ${ids.length} ids, ${cents.length} centroids)")
  require(ids == ids.sorted,
    "NearestCentroid ids must be sorted ascending (tie-break contract)")

  // plain JVM arrays for the runtime loop; built once per expression
  private lazy val idArr: Array[Long] = ids.toArray
  private lazy val matArr: Array[Array[Double]] = cents.map(_.toArray).toArray

  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("k", LongType, nullable = false)))
  override def prettyName: String = "graft_nearest_centroid"

  // the runtime loop reads 4-byte float slots (getFloat); any other
  // element type would compute garbage distances silently, so reject it
  // at analysis time (checkInputDataTypes directly — the
  // ImplicitCastInputTypes mixin is private[sql])
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.catalogString}")
    }

  // null for non-null children on dimension mismatch
  override def nullable: Boolean = true

  override def nullSafeEval(e: Any): Any =
    NearestCentroidUtil.nearest(e.asInstanceOf[ArrayData], matArr, idArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centMat", matArr, "double[][]")
    val idsRef = ctx.addReferenceObj("centIds", idArr, "long[]")
    nullSafeCodeGen(ctx, ev, e => {
      val tmp = ctx.freshName("ncTmp")
      s"""
         |InternalRow $tmp = graft.functions.NearestCentroidUtil.nearest($e, $matRef, $idsRef);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
