package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: `tools/run.sh graft.Explain [sfDir] [query ...]` prints
  * `explain("formatted")` for the named queries (default: a survey of the
  * pushdown / broadcast / partial-agg critical paths). Iterating on plans
  * is a first-class step of the build loop (builder prompt: "explain the
  * plan and iterate until it's the plan you'd want").
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_agg_q1", "q_join_inner", "q_similarity_topk", "q_window_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
