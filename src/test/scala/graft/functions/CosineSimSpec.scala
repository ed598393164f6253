package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CosineSimSpec extends SparkSpec {

  test("native fused cosine == three-fold spelling, bit for bit") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(200)
    val a = emb.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = emb.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val pairs = a.join(b, col("v1") < col("v2")).limit(500)
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def nrm(x: org.apache.spark.sql.Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val both = pairs.select(
      GraftFunctions.cosine_sim(col("e1"), col("e2")).as("native"),
      (dot(col("e1"), col("e2")) / (nrm(col("e1")) * nrm(col("e2")))).as("folded"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("self-similarity is 1.0 within an ulp; null in -> null out") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(50)
    emb.select(GraftFunctions.cosine_sim(col("embedding"), col("embedding")).as("s"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
    val n = emb.select(
      GraftFunctions.cosine_sim(lit(null).cast("array<float>"), col("embedding")))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("length mismatch -> null (not NPE) under whole-stage codegen") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(20)
    val rows = emb.select(
      GraftFunctions.cosine_sim(slice(col("embedding"), 1, 8), col("embedding")).as("s"),
      GraftFunctions.cosine_sim(col("embedding"), col("embedding")).as("ok"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(0), "mismatched lengths must yield null")
      assert(!r.isNullAt(1))
    }
  }

  test("stays in whole-stage codegen") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val plan = emb
      .select(GraftFunctions.cosine_sim(col("embedding"), col("embedding")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_cosine_sim"), s"no codegen:\n$plan")
  }
}
