package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
/** Dev A/B: q_c4_clean exchange-first vs checkpoint-before-sort. */
object C4AB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    def time(tag: String)(f: => Unit): Unit = {
      f
      val t = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }.min
      println(f"[c4ab] $sfDir $tag%-18s $t%.3f s")
    }
    time("exchange-first") {
      FilterOps.c4Clean(
        FilterOps.derivedLines(docs.repartitionByRange(col("doc_id"))), "ltext")
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    time("ckpt-before-sort") {
      TinyLoop.corpusCheckpoint(
        FilterOps.c4Clean(FilterOps.derivedLines(docs), "ltext"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
