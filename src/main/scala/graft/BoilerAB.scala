package graft
import org.apache.spark.sql.SparkSession
/** Dev A/B: boilerplateStrip two-explode vs one-evaluation checkpoint. */
object BoilerAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    def run(lit: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.ops.FilterOps.boilerplateStrip(docs,
          maxLiteralBoiler = if (lit) graft.ops.FilterOps.MaxLiteralBoilerLines else 0L)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(true); run(false) // warmup both
    val literal = (1 to 3).map(_ => run(true)).min
    val joined = (1 to 3).map(_ => run(false)).min
    println(f"[boilerAB] $sfDir literal=$literal%.3f s  join-ckpt=$joined%.3f s")
    spark.stop()
  }
}
