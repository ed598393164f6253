package graft
import org.apache.spark.sql.SparkSession

/** Dev plan-audit main: print the formatted physical plan of the named
  * registered queries (the ".explain and iterate until it's the plan
  * you'd want" loop). Usage:
  * `tools/run.sh graft.Explain <sfDir> q_tpch_q21 q_tpch_q9 ...`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Explain <sfDir> <query> [query ...]")
      sys.exit(2)
    }
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("SPARK_GRAFT_EXEC")) {
        // AQE finalizes the plan only at execution: run the DataFrame's
        // own query execution (collect — a write would plan a separate
        // execution), then print the EXECUTED plan (ReusedExchange /
        // runtime join strategy choices are visible only here)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
