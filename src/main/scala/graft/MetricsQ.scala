package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev-only per-operator metrics probe (not part of the driver
  * contract): execute a registered query once (warm, via collect so the
  * DataFrame's own execution carries the metrics) and print every
  * physical node with its SQL metrics — the offline stand-in for the
  * Spark UI's SQL tab on this UI-less sandbox. Usage:
  * `tools/run.sh graft.MetricsQ <sfDir> q_embed_dedup ...`
  */
object MetricsQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def walk(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
      println(s"${"  " * depth}${p.nodeName}  [$ms]")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case _ =>
          p.children.foreach(walk(_, depth + 1))
          p.subqueries.foreach(walk(_, depth + 1))
      }
    }
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      walk(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
