package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the safety margin of semanticDedup's int8 prefilter: the
  * within-cell pair join compares per-vector-scaled int8 quantizations
  * at `threshold - slack`, and only float-rechecks the survivors — so
  * the operator is exact ONLY while the quantized cosine never strays
  * more than `slack` from the float cosine. This spec measures the
  * actual quantization error over EVERY pair (not just within-cell) of
  * the sf0.01 corpus and requires an order-of-magnitude headroom under
  * the default slack, so a fixture change or a quantizer edit that eats
  * the margin fails loudly here before it can silently drop a true
  * duplicate pair at the verify gate.
  */
class QuantizedPrefilterSpec extends SparkSpec {

  private val DefaultSlack = 0.08

  private def int8(emb: Column): Column = {
    val maxAbs = array_max(transform(emb, v => abs(v.cast("double"))))
    when(maxAbs > 0.0,
      transform(emb, v =>
        round(v.cast("double") * lit(127.0) / maxAbs).cast("tinyint")))
      .otherwise(transform(emb, v => lit(0).cast("tinyint")))
  }

  test("quantized cosine stays an order of magnitude inside the slack") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"), int8(col("embedding")).as("qv"))
    val asFloat = (c: Column) => transform(c, _.cast("float"))
    val maxErr = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"),
        col("qv").as("qa"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("eb"),
        col("qv").as("qb")))
      .filter(col("ia") < col("ib"))
      .select(abs(
        graft.functions.GraftFunctions.cosine_sim(col("ea"), col("eb")) -
          graft.functions.GraftFunctions.cosine_sim(
            asFloat(col("qa")), asFloat(col("qb")))).as("err"))
      .agg(max(col("err"))).head.getDouble(0)
    assert(maxErr < DefaultSlack / 10,
      f"int8 quantization error $maxErr%.5f has lost its 10x headroom " +
        f"under the $DefaultSlack prefilter slack")
  }

  test("prefilter never drops a float-passing pair at sf0.01") {
    val threshold = 0.42
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"), int8(col("embedding")).as("qv"))
    val asFloat = (c: Column) => transform(c, _.cast("float"))
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"),
        col("qv").as("qa"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("eb"),
        col("qv").as("qb")))
      .filter(col("ia") < col("ib"))
      .select(
        graft.functions.GraftFunctions.cosine_sim(col("ea"), col("eb")).as("f"),
        graft.functions.GraftFunctions.cosine_sim(
          asFloat(col("qa")), asFloat(col("qb"))).as("q"))
      .filter(col("f") >= threshold && col("q") < threshold - DefaultSlack)
    assert(pairs.isEmpty,
      "int8 prefilter would drop pairs the float cosine accepts")
  }

  test("cosine_sim_i8 == cast-to-float cosine, bit-identical on every pair") {
    // the byte-reading expression is what the pair join actually runs
    // (the cast spelling is an interpreted CodegenFallback); int8→double
    // is exact, so the two must agree to the last bit
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), int8(col("embedding")).as("qv"))
    val asFloat = (c: Column) => transform(c, _.cast("float"))
    val diff = emb.select(col("vec_id").as("ia"), col("qv").as("qa"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("qv").as("qb")))
      .filter(col("ia") < col("ib"))
      .filter(
        graft.functions.GraftFunctions.cosine_sim_i8(col("qa"), col("qb")) =!=
          graft.functions.GraftFunctions.cosine_sim(
            asFloat(col("qa")), asFloat(col("qb"))))
    assert(diff.isEmpty, "cosine_sim_i8 diverged from the cast spelling")
  }

  test("zero vectors quantize to zeros and are never duplicates") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    // Row-based collect: Array[Byte] ENCODES as BINARY, so a typed
    // Dataset can't read the array<tinyint> column back directly
    val q = df.select(col("vec_id"), int8(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(q(1L) == Seq[Byte](0, 0, 0))
    assert(q(2L) == Seq[Byte](42, 85, 127))
  }
}
