package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc text-shuffle scan at an arbitrary SF (the CI gate lives in
  * PlanHygieneSpec and runs at sf0.01; this main exists for sf0.1+
  * spot-checks). Delegates to [[graft.plans.TextShuffleAudit]] — the
  * single walker both entry points share.
  */
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
        val hits = graft.plans.TextShuffleAudit.offendingExchanges(fn(spark, sfDir))
        checked += 1
        if (hits.nonEmpty) println(s"[textshuffle] $name: ${hits.mkString("; ")}")
      } catch { case e: Throwable => println(s"[textshuffle] $name ERR ${e.getClass.getSimpleName}") }
    }
    println(s"[textshuffle] scan complete: $checked queries checked")
    spark.stop()
  }
}
