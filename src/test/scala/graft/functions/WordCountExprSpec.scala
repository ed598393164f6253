package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextOps

class WordCountExprSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "", "a", " a  b\t c\n", "a b" /* NBSP */, "多 词 计数",
    "the quick brown fox", "   ", "one", "x y　z")

  test("native expression == built-ins combo on the fixture corpus") {
    val df = corpus.toDF("text")
    val got = df.select(
      GraftFunctions.word_count(col("text")).as("native"),
      TextOps.wordCountBuiltins(col("text")).as("combo")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("native expression == fieldsCount on real document text") {
    val docs = graft.Tables.documents(spark, sfDir).limit(100)
    val rows = docs.select(col("text"), GraftFunctions.word_count(col("text")).as("n"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == graft.ocr.OcrPipeline.fieldsCount(r.getString(0)))
    }
  }

  test("null in -> null out") {
    val r = Seq[Option[String]](None).toDF("text")
      .select(GraftFunctions.word_count(col("text"))).collect().head
    assert(r.isNullAt(0))
  }

  test("participates in whole-stage codegen (no fallback)") {
    val df = graft.Tables.documents(spark, sfDir)
      .select(GraftFunctions.word_count(col("text")).as("n"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_word_count"), s"no codegen span in:\n$plan")
    assert(df.agg(sum(col("n"))).collect().head.getLong(0) > 0)
  }

  test("SQL registration: graft_word_count callable from spark.sql") {
    GraftFunctions.registerAll(spark)
    graft.Tables.documents(spark, sfDir).createOrReplaceTempView("graft_docs_wc")
    val n = spark.sql(
      "SELECT graft_word_count(text) AS n FROM graft_docs_wc WHERE doc_id = 0")
      .collect().head.getLong(0)
    assert(n > 0)
  }

  test("SQL registration: all four native expressions resolve from spark.sql") {
    GraftFunctions.registerAll(spark)
    graft.Tables.documents(spark, sfDir).createOrReplaceTempView("graft_docs_fn")
    val row = spark.sql(
      """SELECT graft_simhash64(split(text, ' ')) AS sh,
        |       graft_minhash_sig(split(text, ' ')) AS mh,
        |       graft_cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs
        |FROM graft_docs_fn WHERE doc_id = 0""".stripMargin)
      .collect().head
    assert(row.getString(0).length == 16)
    assert(row.getSeq[String](1).size == 8)
    assert(row.getDouble(2) == 1.0)
  }
}
