package graft
import org.apache.spark.sql.SparkSession

/** Dev-only evidence run for the r10 bench-protocol change: measures
  * the SAME queries in the SAME JVM under BOTH protocols —
  * (a) interleaved passes (each query's runs N queries apart, the
  * pre-r10 bench), then (b) consecutive min-of-3 per query (the DuckDB
  * yardstick's protocol, the r10 bench) — and prints the per-query
  * pair. Order (a)-then-(b) biases AGAINST (b) only via general JVM
  * warmup, which the leading full warmup pass removes.
  *
  * Usage: tools/run.sh graft.ProtocolAB <sfDir> [q1 q2 ...]
  */
object ProtocolAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q_tpch_q6", "q_tpch_q18", "q_agg_q1", "q_dsir_weights",
      "q_gopher_rules", "q_boilerplate_strip", "q_repeated_spans",
      "q_perplexity_filter", "q_window_moving", "q_bm25",
      "q_line_dedup", "q_inverted_index")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = names.map(n => n -> SparkEntry.queries(n))
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    fns.foreach { case (_, fn) => run(fn) } // warmup
    // SPARK_GRAFT_AB_REVERSE=1 runs (b) before (a) — if the effect were
    // JVM warmup rather than protocol, reversing the order would flip it
    val reverse = sys.env.contains("SPARK_GRAFT_AB_REVERSE")
    def interleavedPass(): Map[String, Double] = {
      val inter = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
      (1 to 3).foreach { _ =>
        fns.foreach { case (n, fn) => System.gc(); inter(n) = run(fn) :: inter(n) }
      }
      inter.view.mapValues(_.min).toMap
    }
    def consecutivePass(): Map[String, Double] = fns.map { case (n, fn) =>
      System.gc()
      n -> (1 to 3).map(_ => run(fn)).min
    }.toMap
    val (inter, consec) =
      if (reverse) { val c = consecutivePass(); (interleavedPass(), c) }
      else { val i = interleavedPass(); (i, consecutivePass()) }
    var ti = 0.0; var tc = 0.0
    names.foreach { n =>
      val i = inter(n); val c = consec(n); ti += i; tc += c
      println(f"[protocol-ab] $n%-24s interleaved=$i%6.3f consecutive=$c%6.3f penalty=${(i / c - 1) * 100}%5.1f%%")
    }
    println(f"[protocol-ab] TOTAL interleaved=$ti%6.2f consecutive=$tc%6.2f penalty=${(ti / tc - 1) * 100}%5.1f%%")
    spark.stop()
  }
}
