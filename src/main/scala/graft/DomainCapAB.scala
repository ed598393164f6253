package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B: a hand-salted domainCap pre-rank vs the plain single
  * window on a FLOODED mega-domain (the skew case the r16 scaladoc
  * proposed salting for). MEASURED RESULT (50M rows, 25M-row mega
  * domain, local[32]): salted 5.2 s vs plain 2.4 s — Spark 4 plans the
  * row_number-then-filter shape with a PARTIAL WindowGroupLimit below
  * the exchange (map-side per-domain top-cap), so the flood is already
  * bounded before it shuffles and the salt's extra full-corpus
  * exchange is pure overhead. Kept as the recorded negative datapoint;
  * the pushdown is plan-pinned in TrainPrepOpsSpec.
  * Usage: tools/run.sh graft.DomainCapAB <nRows>
  */
object DomainCapAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // half the rows flood one domain; score has heavy ties (id % 1e6)
    val flood = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, lit("mega.example.org"))
        .otherwise(concat(lit("d"), (col("id") % 10000).cast("string")))
        .as("domain"),
      (col("id") % 1000000).cast("double").as("score"))
    def salted(df: org.apache.spark.sql.DataFrame, cap: Int): org.apache.spark.sql.DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain"), col("__s"))
        .orderBy(col("score").desc, col("doc_id").asc)
      graft.ops.TrainPrepOps.domainCap(
        df.withColumn("__s", pmod(xxhash64(col("doc_id")), lit(16L)))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= cap).drop("__rn", "__s"),
        "domain", "score", "doc_id", cap)
    }
    def run(salt: Int): Double = {
      val t0 = System.nanoTime()
      val out =
        if (salt > 1) salted(flood, 2)
        else graft.ops.TrainPrepOps.domainCap(flood, "domain", "score", "doc_id", 2)
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(16); run(1) // warmup both
    val saltedSec = (1 to 3).map(_ => run(16)).min
    val plainSec = (1 to 3).map(_ => run(1)).min
    println(f"[domainCapAB] n=$n salted(16)=$saltedSec%.3f s  plain=$plainSec%.3f s")
    spark.stop()
  }
}
