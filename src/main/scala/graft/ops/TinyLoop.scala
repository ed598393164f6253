package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge, Row, SparkSession}

/** Conf-scoped execution for MODEL-STATE training loops (k-means
  * centroid updates, BPE merge rounds) and single-job corpus-checkpoint
  * materializations: every per-iteration job aggregates a bounded table
  * (K·dim rows, the vocabulary histogram) whose runtime is pure
  * scheduling floor, and AQE splits each into a shuffle-stage job plus
  * a result-stage job — doubling the loop's job count for a re-plan
  * that has nothing to improve on bounded data — while the 32-partition
  * default spreads a few hundred rows over 32 near-empty reduce tasks.
  * One reduce task IS the right plan for bounded state (AQE would
  * coalesce to it; without AQE it must be pinned).
  *
  * Isolation (r11): the overrides live on a CLONED session — same
  * runtime confs, temp views, and registered functions, same shared
  * catalog and cache (so InMemoryRelation lookups still hit), but
  * isolated conf state — and the work is re-bound onto it by logical
  * plan. The caller's session is NEVER mutated, so an unrelated query
  * planned concurrently on it keeps AQE and full shuffle parallelism
  * (the r10 spelling mutated `spark.conf` in place and raced exactly
  * there). Frames returned to callers are re-bound onto the caller's
  * session, so no caller-visible frame is ever PLANNED under the
  * overrides. The CORPUS passes of a training operator (histogram
  * build, cached-corpus assignment scans) are unaffected by the
  * model-state pin: shuffle.partitions only shapes the reduce side.
  */
object TinyLoop {

  /** Clone `spark` and apply the overrides to the clone only. */
  private def scoped(spark: SparkSession, confs: (String, String)*): SparkSession = {
    val s = GraftBridge.cloneSession(spark)
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  /** Re-bind `df`'s logical plan onto `s` (same SparkContext): the
    * resulting frame plans and executes under `s`'s confs. Shared
    * cache manager + copied function registry mean cached subtrees and
    * session-registered UDFs resolve identically on the clone.
    */
  private def rebind(df: DataFrame, s: SparkSession): DataFrame =
    GraftBridge.ofRows(s, df.queryExecution.logical)

  /** Materialize a CORPUS-scale checkpoint as ONE Spark job, KEEPING
    * the session's shuffle parallelism (unlike the model-state scope,
    * which also pins one reduce task and is only for bounded state).
    * Rationale: AQE turns every exchange boundary into its own job — a
    * scan → exchange → agg → checkpoint materialization becomes 3 jobs
    * whose inter-job scheduling gaps dominate small-corpus runs — while
    * its actual levers (partition coalescing, skew splitting) have
    * nothing to offer a map-side-combined aggregation whose reduce side
    * is vocabulary-bounded. The returned frame (a checkpointed
    * LogicalRDD) is re-bound onto the caller's session.
    */
  def corpusCheckpoint(df: DataFrame): DataFrame = {
    val caller = df.sparkSession
    val s = scoped(caller, "spark.sql.adaptive.enabled" -> "false")
    rebind(rebind(df, s).localCheckpoint(), caller)
  }

  /** [[corpusCheckpoint]] that also evaluates bounded aggregate
    * `metrics` DURING the materialization job (a `CollectMetrics`
    * node / `Dataset.observe`): the one-pass spelling of "checkpoint
    * the corpus AND reduce it to model state" — without this, the
    * model-state aggregation is a second job re-reading the checkpoint
    * it just wrote. The metrics row is exactly what the aggregation
    * would have returned; metrics must be ungrouped aggregates (the
    * observe contract). Returns (checkpointed frame re-bound onto the
    * caller's session, metrics row).
    */
  def corpusCheckpointObserved(
      df: DataFrame, metrics: Seq[org.apache.spark.sql.Column]): (DataFrame, Row) = {
    require(metrics.nonEmpty, "corpusCheckpointObserved needs >= 1 metric")
    val caller = df.sparkSession
    val s = scoped(caller, "spark.sql.adaptive.enabled" -> "false")
    val name = s"graft_cp_metrics_${java.util.UUID.randomUUID()}"
    val observed = rebind(df, s).observe(name, metrics.head, metrics.tail: _*)
    val cp = observed.localCheckpoint()
    val row = observed.queryExecution.observedMetrics.getOrElse(name,
      throw new IllegalStateException(
        s"corpusCheckpointObserved: metrics '$name' missing after the " +
          "materialization action — CollectMetrics did not run"))
    (rebind(cp, caller), row)
  }

  /** Bounded single-job collect: up to `cap + 1` rows (callers check
    * `length <= cap` and fail/fall back on overflow — the driver never
    * holds more, the knnLabel collect discipline). CollectLimit's
    * incremental partition scale-up (1 → 4 → 16 → …) costs a JOB per
    * step; the sources here are materialized checkpoints whose every
    * partition the caller expects to read (the cap is a safety bound,
    * not a selection), so pin the initial partition count high and read
    * them all in ONE job, on the AQE-free clone.
    */
  def boundedCollect(df: DataFrame, cap: Long): Array[Row] = {
    val capInt = math.min(cap, Int.MaxValue - 2L).toInt
    val s = scoped(df.sparkSession,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.limit.initialNumPartitions" -> "1000000")
    rebind(df, s).limit(capInt + 1).collect()
  }

  /** One-reduce-task, AQE-free collect of a BOUNDED model-state
    * aggregation (per-order LM stats, a merge round's winner): the
    * whole result is driver-sized by construction.
    */
  def modelCollect(df: DataFrame): Array[Row] = {
    val s = scoped(df.sparkSession,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "1")
    rebind(df, s).collect()
  }

  /** Model-state ITERATION scope: `state` re-bound onto a one-reduce-
    * task, AQE-free clone and handed to `body` — every plan derived
    * from the re-bound frame inside the loop inherits the clone's
    * confs, while the caller's session stays untouched for concurrent
    * queries. `body`'s result must be driver-sized state or a frame the
    * caller re-materializes itself (the kmeans/bpeMerges contract:
    * both return collected model state, never a lazy plan over the
    * scoped frame).
    */
  def withModelState[T](state: DataFrame)(body: DataFrame => T): T = {
    val s = scoped(state.sparkSession,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "1")
    body(rebind(state, s))
  }
}
