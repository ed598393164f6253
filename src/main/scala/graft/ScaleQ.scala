package graft
import org.apache.spark.sql.SparkSession

/** Dev-only scale-run harness for PARAMETERIZED operators (not part of
  * the driver contract — registered queries go through [[TimeQ]]). The
  * one operator whose scale knob must move with corpus size is
  * semanticDedup: its candidate-pair volume is O(sum of cell sizes
  * squared), so an honest N-times datapoint scales the cell count k
  * with N to hold the average cell size constant — the SemDeDup paper's
  * own prescription (k proportional to corpus size). Running the
  * registered fixed-k query on a 100-times corpus would measure a
  * quadratic blow-up the real deployment would never configure.
  *
  * Since r16 the default k = 0 means AutoK — the operator derives the
  * cell count from the corpus-count probe itself, which is exactly the
  * scaling prescription above made automatic; passing an explicit k
  * still pins it.
  *
  * Usage: `tools/run.sh graft.ScaleQ <sfDir> semantic_dedup <k>`
  *        `tools/run.sh graft.ScaleQ <sfDir> embed_dedup <k>`   (k=0: AutoK)
  * `embed_dedup` runs the FULL q_embed_dedup composite — documents →
  * embedFromText → semanticDedup — for the 100× composite datapoint.
  */
object ScaleQ {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 && Set("semantic_dedup", "embed_dedup")(args(1)),
      "usage: ScaleQ <sfDir> semantic_dedup|embed_dedup <k>")
    val (sfDir, mode, k) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    spark.range(1000).selectExpr("sum(id)").collect()
    val emb =
      if (mode == "embed_dedup") GraftOps.embedFromText(Tables.documents(spark, sfDir))
      else Tables.embeddings(spark, sfDir)
    def run(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val out = GraftOps.semanticDedup(emb, k = k,
        threshold = if (mode == "embed_dedup") 0.96 else 0.42,
        prefilterSlack = if (mode == "embed_dedup") 0.03 else 0.08)
      val (n, dups) = {
        import org.apache.spark.sql.functions.{count, sum}
        val r = out.agg(count("*"), sum("is_dup")).head
        (r.getLong(0), r.getLong(1))
      }
      ((System.nanoTime() - t0) / 1e9, n, dups)
    }
    run() // warmup
    val best = (1 to 3).map(_ => run()).minBy(_._1)
    println(f"[scaleq] $mode k=$k  ${best._1}%8.3f s  " +
      f"rows=${best._2}  dups=${best._3}")
    spark.stop()
  }
}
