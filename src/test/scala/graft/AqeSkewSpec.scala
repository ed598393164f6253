package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime half of the engine's skew story
  * (the static half is the salting recipe, `q_skew_salted`). A 100 TB
  * join with one hot key must NOT serialize into a single straggler
  * task: AQE's OptimizeSkewedJoin splits the oversized partition into
  * parallel sub-reads. This spec drives a deliberately skewed
  * sort-merge join with the skew thresholds scaled down to fixture size
  * and asserts (a) the executed plan actually took the skew-split path
  * and (b) the result is still exactly correct.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // fixture-scale thresholds: the hot partition (~190k rows of key 0)
      // is "skewed" relative to these, exactly as a multi-GB partition is
      // relative to the 256MB default at cluster scale
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "131072")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      // 95% of the left side shares key 0; the right side is uniform
      val left = spark.range(200000)
        .selectExpr("CASE WHEN id < 190000 THEN 0 ELSE id % 100 END AS k",
          "id AS payload")
      val right = spark.range(100).selectExpr("id AS rk", "id AS rv")
      val joined = left.join(right, col("k") === col("rk"))
      // execute THIS dataframe's own adaptive plan (count() would build a
      // separate query execution and leave this one unexecuted/unsplit)
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      // every left row matches exactly one right key
      assert(n == 200000L, s"wrong join cardinality: $n")
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew"),
        s"skew split did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
