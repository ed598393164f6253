package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage-timing probe (not part of the driver contract): times
  * named sub-pipelines so perf work targets the real bottleneck instead
  * of a guess. Usage: tools/run.sh graft.Probe <sfDir>.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.functions._
    import ops.TextOps.words

    def docs = Tables.documents(spark, sfDir)

    def shingled: DataFrame = docs
      .filter(ops.TextOps.wordCount(col("text")) >= 3)
      .select(col("doc_id"), ops.TextOps.shingles(col("text"), 3).as("shingles"))

    def sig: DataFrame = {
      val s = functions.GraftFunctions.minhash_sig(col("shingles"))
      shingled.select(col("doc_id") +: (0 until 8).map(k => s.getItem(k).as(s"m$k")): _*)
    }

    def bands: DataFrame = {
      val bandStructs = (0 until 4).map { b =>
        struct(lit(b).as("band_idx"),
          md5(concat(col(s"m${2 * b}"), col(s"m${2 * b + 1}"))).as("band_hash"))
      }
      sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bd"))
        .select(col("doc_id"), col("bd.band_idx"), col("bd.band_hash"))
    }
    def buckets: DataFrame = {
      val minK = udaf(new functions.MinKLongsAgg(ops.DedupOps.MaxBucketDocs))
      bands.groupBy("band_idx", "band_hash").agg(minK(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
    }
    def bucketsCollect: DataFrame =
      bands.groupBy("band_idx", "band_hash")
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) > 1)
    def pairsNoDistinct: DataFrame = buckets
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
          struct(x.as("d1"), y.as("d2")))))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))

    val stages: Seq[(String, () => Long)] = Seq(
      "scan_only" -> (() => docs.count()),
      "sig8" -> (() => sig.count()),
      "bands" -> (() => bands.count()),
      "buckets_minK" -> (() => buckets.count()),
      "buckets_coll" -> (() => bucketsCollect.count()),
      "pairs_nodist" -> (() => pairsNoDistinct.count()),
      "pairs_full" -> (() => ops.DedupOps.lshCandidatePairs(docs).count())
    )
    // warmup then 2 measured, min
    stages.foreach { case (_, f) => f() }
    stages.foreach { case (name, f) =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-12s ${ts.min}%8.3f s")
    }
    spark.stop()
  }
}
