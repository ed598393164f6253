package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** The optimizer extension gets its own session (extensions bind at
  * session construction; the shared TestSpark session must stay vanilla).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    graft.TestSpark.spark // ensure the SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("FuseWordCount rewrites the built-ins combo to the native expression") {
    // parquet-backed so ConvertToLocalRelation can't fold the projection away
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(TextOps.wordCountBuiltins(col("text")).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_word_count"), s"not fused:\n$optimized")
    // fused result == native spelling result
    val native = docs.select(graft.functions.GraftFunctions.word_count(col("text")).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      native.collect().map(_.getLong(0)).toSeq)
  }

  test("rule leaves non-matching filters alone") {
    import spark.implicits._
    // filter keeps only long tokens — NOT the non-empty predicate; the
    // rule must not touch it.
    val df = Seq("aa b ccc").toDF("text").select(
      size(filter(split(col("text"), TextOps.WsRe), t => length(t) > 1))
        .cast("long").as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_word_count"), s"over-fused:\n$optimized")
    assert(df.as[Long].collect().toSeq == Seq(2L))
  }

  test("vanilla session (no extension) is unaffected") {
    val s2 = graft.TestSpark.spark
    import s2.implicits._
    val df = Seq("a b").toDF("text")
      .select(TextOps.wordCountBuiltins(col("text")).as("n"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_word_count"))
    assert(df.as[Long].collect().toSeq == Seq(2L))
  }
}
