package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the r16-optimization codegen expressions (VecQuant.scala)
  * against the builtin fold spellings they replaced: the fused
  * Int8Quant / SqNormF / SqNormCounts / L2NormCounts passes must be
  * VALUE-IDENTICAL to the interpreted transform/aggregate/array_max
  * stacks — same left-fold order, same IEEE ops, same HALF_UP round,
  * same null propagation — on the real corpus AND on adversarial rows
  * (ties at .5, zero vectors, empty arrays, negative values).
  */
class VecQuantSpec extends SparkSpec {

  import graft.functions.GraftFunctions._

  private def oldNorm(e: Column): Column =
    sqrt(aggregate(e, lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))

  private def oldEps(e: Column): Column = {
    val maxAbs = array_max(transform(e, v => abs(v.cast("double"))))
    val norm = oldNorm(e)
    when(norm > 0.0,
      sqrt(size(e).cast("double")) * maxAbs / 254.0 / norm)
      .otherwise(lit(Double.PositiveInfinity))
  }

  test("Int8Quant matches the builtin int8/eps/norm spellings on the corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"),
        int8_quant(col("embedding")).as("q"))
    val diff = emb.select(
      (col("q.qv") === graft.ops.MlOps.int8(col("embedding"))).as("qv_eq"),
      (col("q.qeps") === oldEps(col("embedding"))).as("eps_eq"),
      (col("q.nrm") === oldNorm(col("embedding"))).as("nrm_eq"))
      .filter(!col("qv_eq") || !col("eps_eq") || !col("nrm_eq"))
    assert(diff.count() === 0L,
      "fused Int8Quant diverged from the builtin quantize spelling")
  }

  test("Int8Quant matches the builtin spellings on adversarial vectors") {
    import spark.implicits._
    // ties at exactly .5 after scaling (HALF_UP both directions), a
    // zero vector, an empty vector, a one-element vector, denormals,
    // sign mixes — every branch of the fused pass
    val rows = Seq(
      (1L, Seq(2.0f, 1.0f, -1.0f, 0.5f)),         // 127*0.5/2 ties
      (2L, Seq(0.0f, 0.0f, 0.0f)),                // zero vector
      (3L, Seq.empty[Float]),                     // empty
      (4L, Seq(-3.5f)),                           // single negative
      (5L, Seq(1e-30f, -1e-30f, 1e-30f)),         // tiny magnitudes
      (6L, Seq(127f, -127f, 63.5f, -63.5f, 1f)),  // .5 ties both signs
      (7L, Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)))
      .toDF("vec_id", "embedding")
    val q = rows.select(col("vec_id"), col("embedding"),
      int8_quant(col("embedding")).as("q"))
    val bad = q.select(
      (col("q.qv") === graft.ops.MlOps.int8(col("embedding"))).as("qv_eq"),
      (col("q.qeps") === oldEps(col("embedding"))).as("eps_eq"),
      // empty array: old fold gives 0.0, so compare through coalesce on
      // equality (both non-null here)
      (col("q.nrm") === oldNorm(col("embedding"))).as("nrm_eq"))
      .filter(!col("qv_eq") || !col("eps_eq") || !col("nrm_eq"))
    assert(bad.count() === 0L,
      "fused Int8Quant diverged on an adversarial vector")
  }

  test("SqNormF matches the aggregate fold (zero-norm guard parity)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val oldSq = aggregate(col("embedding"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double"))
    val n = emb.select((sq_norm_f(col("embedding")) === oldSq).as("eq"))
      .filter(!col("eq")).count()
    assert(n === 0L)
  }

  test("SqNormCounts/L2NormCounts match the long-fold spellings") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(3L, 4L, 0L)),
      (2L, Seq(0L, 0L)),                          // zero counts -> zeros
      (3L, Seq.empty[Long]),                      // empty
      (4L, Seq(1000000L, 2000000L, 3000000L)),
      (5L, Seq(1L)))
      .toDF("vec_id", "cnts")
    val oldNrm = sqrt(aggregate(col("cnts"), lit(0L), (a, x) => a + x * x)
      .cast("double"))
    val oldEmb = when(oldNrm > 0.0,
      transform(col("cnts"), c => (c.cast("double") / oldNrm).cast("float")))
      .otherwise(transform(col("cnts"), _ => lit(0.0f)))
    val bad = rows.select(
      (sq_norm_counts(col("cnts")) === oldNrm).as("n_eq"),
      (l2_norm_counts(col("cnts")) === oldEmb).as("e_eq"))
      .filter(!col("n_eq") || !col("e_eq"))
    assert(bad.count() === 0L)
    // overflow stays loud (the ANSI-guard parity)
    val boom = Seq((9L, Seq(Long.MaxValue / 2, Long.MaxValue / 2)))
      .toDF("vec_id", "cnts")
    intercept[Exception] {
      boom.select(sq_norm_counts(col("cnts"))).collect()
    }
  }
}
