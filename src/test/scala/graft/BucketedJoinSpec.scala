package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing = the "reuse a partitioning across stages" primitive: both
  * sides bucketed on the join key -> sort-merge join with NO shuffle
  * exchange. This is the plan-shape proof (results are oracle-checked by
  * q_bucketed_join).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-bucketed equi-join plans without a shuffle exchange") {
    val base = Files.createTempDirectory("graft_bkt_spec").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS spec_orders_bkt")
    spark.sql("DROP TABLE IF EXISTS spec_customer_bkt")
    Tables.orders(spark, sfDir).write
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$base/o").saveAsTable("spec_orders_bkt")
    Tables.customer(spark, sfDir).write
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$base/c").saveAsTable("spec_customer_bkt")
    // disable broadcast so the bucket layout, not a broadcast, must carry it
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("spec_orders_bkt")
        .join(spark.table("spec_customer_bkt"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle exchange in:\n$plan")
      assert(joined.count() > 0)
    }
  }

  // The 100 TB admission story: the persisted LSH index is written
  // bucketed on its band key, so a micro-batch admission probe
  // co-locates against the on-disk layout with NO index-side exchange —
  // only the (orders-of-magnitude smaller) probe side shuffles. This is
  // the q_bucketed_join treatment for the claim in
  // DedupOps.lshIndex/admitAgainstIndex's scaladoc; semantics equality
  // vs an unbucketed index frame is asserted alongside the plan shape.
  test("admitAgainstIndex probes a bucketed on-disk index with no index-side exchange") {
    val base = Files.createTempDirectory("graft_lsh_idx").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS spec_lsh_index_bkt")
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    ops.DedupOps.lshIndex(corpus).write
      .bucketBy(4, "band_idx", "band_hash").sortBy("band_idx", "band_hash")
      .option("path", s"$base/idx").saveAsTable("spec_lsh_index_bkt")
    // disable broadcast: the probe side must arrive via the bucket
    // layout's partitioning, proving the index side re-shuffle-free
    // even when the planner cannot just broadcast the batch
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val admitted = ops.DedupOps.admitAgainstIndex(
        batch, spark.table("spec_lsh_index_bkt"))
      admitted.collect() // run the frame's own QE so AQE finalizes it
      val plan = admitted.queryExecution.executedPlan
      // no shuffle exchange may have the bucketed index scan below it
      // AQE wraps exchanges in leaf QueryStageExec nodes, so a plain
      // collect() never sees them — descend into stages explicitly
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val inner = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case _ => Nil
        }
        p +: (p.children ++ inner).flatMap(allNodes)
      }
      val shuffles = allNodes(plan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      // traversal sanity: the probe side DOES shuffle (broadcast is off),
      // so finding zero shuffles would mean we failed to walk the tree
      assert(shuffles.nonEmpty, s"no shuffles found — traversal broken?\n$plan")
      // offending = an exchange of RAW index rows (index scan below it
      // with no join in between); exchanges above the band join carry
      // probe-bounded hit rows and are fine
      val offenders = shuffles.filter { e =>
        allNodes(e.child).exists {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.toString.contains("spec_lsh_index_bkt")
          case _ => false
        } && !allNodes(e.child).exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      }
      assert(offenders.isEmpty,
        s"index side re-shuffled:\n${offenders.headOption.getOrElse(plan)}")
      val idxScans = allNodes(plan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.toString.contains("spec_lsh_index_bkt") => s
      }
      assert(idxScans.nonEmpty, "bucketed index scan missing from the plan")
      assert(idxScans.forall(_.toString.contains("Bucketed: true")),
        s"index scan not reading via buckets:\n${idxScans.head}")
    }
    // value parity: the bucketed read and the plain frame admit the same set
    val viaBucket = ops.DedupOps.admitAgainstIndex(
        batch, spark.table("spec_lsh_index_bkt"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaFrame = ops.DedupOps.admitAgainstIndex(
        batch, ops.DedupOps.lshIndex(corpus))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBucket == viaFrame)
    assert(viaBucket.nonEmpty)
  }

  // The similarity-side sibling (r11): the persisted IVF index is
  // written bucketed on its cell key, so a query-batch search
  // co-locates against the on-disk layout with NO index-side exchange —
  // the MlOps.ivfIndex/searchAgainstIvfIndex scaladoc claim, proven the
  // same way as the LSH admission probe above.
  test("searchAgainstIvfIndex probes a bucketed on-disk index with no index-side exchange") {
    val base = Files.createTempDirectory("graft_ivf_idx").toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS spec_ivf_index_bkt")
    val emb = Tables.embeddings(spark, sfDir)
    val codebook = GraftOps.kmeansCentroids(emb).localCheckpoint()
    ops.MlOps.ivfIndex(emb, codebook).write
      .bucketBy(4, "cell").sortBy("cell")
      .option("path", s"$base/idx").saveAsTable("spec_ivf_index_bkt")
    val queries = emb.filter(col("vec_id") < 10).select("vec_id", "embedding")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val found = ops.MlOps.searchAgainstIvfIndex(
        queries, codebook, spark.table("spec_ivf_index_bkt"))
      found.collect()
      val plan = found.queryExecution.executedPlan
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val inner = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case _ => Nil
        }
        p +: (p.children ++ inner).flatMap(allNodes)
      }
      val shuffles = allNodes(plan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(shuffles.nonEmpty, s"no shuffles found — traversal broken?\n$plan")
      val offenders = shuffles.filter { e =>
        allNodes(e.child).exists {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.toString.contains("spec_ivf_index_bkt")
          case _ => false
        } && !allNodes(e.child).exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      }
      assert(offenders.isEmpty,
        s"index side re-shuffled:\n${offenders.headOption.getOrElse(plan)}")
      val idxScans = allNodes(plan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.toString.contains("spec_ivf_index_bkt") => s
      }
      assert(idxScans.nonEmpty, "bucketed index scan missing from the plan")
      assert(idxScans.forall(_.toString.contains("Bucketed: true")),
        s"index scan not reading via buckets:\n${idxScans.head}")
    }
    // value parity vs the in-memory index frame
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val viaBucket = key(ops.MlOps.searchAgainstIvfIndex(
      queries, codebook, spark.table("spec_ivf_index_bkt")))
    val viaFrame = key(ops.MlOps.searchAgainstIvfIndex(
      queries, codebook, ops.MlOps.ivfIndex(emb, codebook)))
    assert(viaBucket == viaFrame)
    assert(viaBucket.nonEmpty)
  }

  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
