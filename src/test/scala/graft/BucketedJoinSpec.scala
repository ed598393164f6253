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
