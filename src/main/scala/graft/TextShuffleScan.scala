package graft
import org.apache.spark.sql.SparkSession
object TextShuffleScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var checked = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val hits = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
            if e.child.output.exists(a =>
              a.name == "text" || a.name == "ltext" || a.name == "cleaned" ||
              a.name == "norm" || a.name == "dirty" || a.name == "line") => e
        }
        checked += 1
        if (hits.nonEmpty) println(s"[textshuffle] $name: ${hits.size}")
      } catch { case e: Throwable => println(s"[textshuffle] $name ERR ${e.getClass.getSimpleName}") }
    }
    println(s"[textshuffle] scan complete: $checked queries checked")
    spark.stop()
  }
}
