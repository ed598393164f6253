package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-conf scope for MODEL-STATE training loops (k-means centroid
  * updates, BPE merge rounds): every per-iteration job aggregates a
  * bounded table (K·dim rows, the vocabulary histogram) whose runtime
  * is pure scheduling floor, and AQE splits each into a shuffle-stage
  * job plus a result-stage job — doubling the loop's job count for a
  * re-plan that has nothing to improve on bounded data — while the
  * 32-partition default spreads a few hundred rows over 32 near-empty
  * reduce tasks. One reduce task IS the right plan for bounded state
  * (AQE would coalesce to it; without AQE it must be pinned).
  *
  * Both settings are restored before returning, so no caller-visible
  * frame is ever PLANNED under them; frames localCheckpoint'd inside
  * the scope were already materialized eagerly. The CORPUS passes of a
  * training operator (histogram build, cached-corpus assignment scans)
  * must run OUTSIDE the scope or be materialized before it — only the
  * bounded iteration state belongs in here.
  *
  * CONCURRENCY CAVEAT: `spark.conf.set` is session-wide, not
  * query-scoped — an UNRELATED query planned on the same SparkSession
  * while a training call is inside this scope would also get one
  * reduce task and no AQE. Training operators (kmeans, semanticDedup,
  * bpeMerges) therefore briefly mutate session state: callers running
  * concurrent heavy queries on one session should serialize around
  * training calls or give training its own session
  * (`spark.newSession()` shares the catalog and cache but isolates
  * confs).
  */
object TinyLoop {

  /** AQE-free scope for materializing a CORPUS-scale checkpoint as ONE
    * Spark job, KEEPING the session's shuffle parallelism (unlike
    * [[withModelStateConfs]], which also pins one reduce task and is
    * only for bounded model state). Rationale: AQE turns every exchange
    * boundary into its own job — a scan → exchange → agg → checkpoint
    * materialization becomes 3 jobs whose inter-job scheduling gaps
    * dominate small-corpus runs — while its actual levers (partition
    * coalescing, skew splitting) have nothing to offer a map-side-
    * combined aggregation whose reduce side is vocabulary-bounded.
    * Same restore discipline and concurrency caveat as
    * [[withModelStateConfs]].
    */
  def withCorpusPassConfs[T](spark: SparkSession)(body: => T): T = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  /** Bounded single-job collect: up to `cap + 1` rows (callers check
    * `length <= cap` and fail/fall back on overflow — the driver never
    * holds more, the knnLabel collect discipline). CollectLimit's
    * incremental partition scale-up (1 → 4 → 16 → …) costs a JOB per
    * step; the sources here are materialized checkpoints whose every
    * partition the caller expects to read (the cap is a safety bound,
    * not a selection), so pin the initial partition count high and read
    * them all in ONE job, under the AQE-free scope.
    */
  def boundedCollect(df: org.apache.spark.sql.DataFrame, cap: Long): Array[org.apache.spark.sql.Row] = {
    val capInt = math.min(cap, Int.MaxValue - 2L).toInt
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.limit.initialNumPartitions", "1")
    spark.conf.set("spark.sql.limit.initialNumPartitions", "1000000")
    try withCorpusPassConfs(spark)(df.limit(capInt + 1).collect())
    finally spark.conf.set("spark.sql.limit.initialNumPartitions", prev)
  }

  def withModelStateConfs[T](spark: SparkSession)(body: => T): T = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevShuf = spark.conf.get("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try body
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevShuf)
    }
  }
}
