package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

/** Dev-only single-query timer (not part of the driver contract): times
  * named registered queries (warmup + min of 3) and reports the Spark
  * JOB count per run — training-loop-style queries pay a fixed
  * scheduling floor per job, so the job count is the number that
  * explains their runtime. Usage:
  * `tools/run.sh graft.TimeQ <sfDir> q_kmeans_embed q_ann_ivf_trained`
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    val jobs = new AtomicInteger(0)
    val starts = TrieMap.empty[Int, Long]
    val durs = TrieMap.empty[Int, Long]
    val descs = TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts(js.jobId) = js.time
        // optional per-job provenance (SPARK_GRAFT_JOBDESC=1): the call
        // site string answers "which operator line spawned job N"
        descs(js.jobId) = js.stageInfos
          .map(si => si.name.takeWhile(_ != '\n')).mkString(" | ")
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.get(je.jobId).foreach(s => durs(je.jobId) = je.time - s); ()
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    // same measured action as Bench: a noop-sink write (count() lets
    // Catalyst prune unreferenced projections and cardinality-preserving
    // joins — see Bench.run)
    def run(n: String): Unit = SparkEntry.queries(n)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      run(n) // warmup
      val runs = (1 to 3).map { _ =>
        // the listener bus is async: give the previous run's tail events
        // time to drain before zeroing, or its JobStart/JobEnd bleed
        // into this run's counters (listenerBus.waitUntilEmpty is
        // private[spark]; a short drain sleep is enough for a dev tool)
        Thread.sleep(150)
        jobs.set(0); starts.clear(); durs.clear(); descs.clear()
        // split out the DRIVER-SIDE cost: DataFrame construction +
        // analysis (buildMs) and optimization + physical planning
        // (planMs) — the part of the per-query floor no job-count cut
        // can touch. The write action below replans its own command
        // wrapper, so this is a lower bound on planning paid per run.
        val tb = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.analyzed
        val tp = System.nanoTime()
        df.queryExecution.executedPlan
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - tb) / 1e9, jobs.get(),
          durs.toSeq.sortBy(_._1).map(_._2).mkString(","),
          descs.toSeq.sortBy(_._1)
            .map { case (id, d) => s"  job $id: ${durs.getOrElse(id, -1L)}ms  $d" }
            .mkString("\n"),
          (tp - tb) / 1e9, (t0 - tp) / 1e9)
      }
      val best = runs.minBy(_._1)
      println(f"[timeq] $n%-24s ${best._1}%8.3f s  jobs=${best._2}  " +
        f"buildMs=${math.round(best._5 * 1000)}  planMs=${math.round(best._6 * 1000)}  " +
        f"jobMs=[${best._3}]")
      if (sys.env.contains("SPARK_GRAFT_JOBDESC")) println(best._4)
    }
    spark.stop()
  }
}
