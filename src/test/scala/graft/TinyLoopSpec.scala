package graft

import org.apache.spark.sql.functions._

/** The r11 conf-isolation contract: TinyLoop's scopes run on a CLONED
  * session and never mutate the caller's — a concurrent query planned
  * on the caller during a training loop must keep AQE and full shuffle
  * parallelism (the r10 spelling set `spark.conf` in place and raced
  * exactly there).
  */
class TinyLoopSpec extends SparkSpec {

  private def callerIsClean(): Unit = {
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
  }

  test("withModelState: scoped frame pins 1 reduce task, caller keeps AQE + parallelism") {
    import spark.implicits._
    val state = (1L to 100L).map(i => (i % 5, i)).toDF("k", "x").localCheckpoint()
    val out = graft.ops.TinyLoop.withModelState(state) { scoped =>
      // the re-bound frame plans under the clone's confs...
      assert(scoped.sparkSession ne spark, "must not be the caller session")
      assert(scoped.sparkSession.conf.get("spark.sql.shuffle.partitions") == "1")
      assert(scoped.sparkSession.conf.get("spark.sql.adaptive.enabled") == "false")
      val agg = scoped.groupBy("k").agg(sum("x").as("s"))
      assert(agg.rdd.getNumPartitions == 1, "model-state agg must be 1 reduce task")
      // ...while a CONCURRENT query on the caller keeps its plan features
      callerIsClean()
      val concurrent = (1 to 50).toDF("v").groupBy("v").count()
      val plan = concurrent.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"),
        s"concurrent query lost AQE:\n$plan")
      agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(out == (1L to 100L).groupBy(_ % 5).view.mapValues(_.sum).toMap)
    callerIsClean()
  }

  test("corpusCheckpoint / boundedCollect / modelCollect leave the caller untouched") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i % 7, i)).toDF("k", "x")
    val ck = graft.ops.TinyLoop.corpusCheckpoint(df.groupBy("k").count())
    // the returned frame is RE-BOUND to the caller: downstream plans
    // derived from it must get the caller's confs (AQE back on)
    assert(ck.sparkSession eq spark, "checkpoint must come back on the caller session")
    assert(ck.count() == 7)
    callerIsClean()
    val rows = graft.ops.TinyLoop.boundedCollect(df, 500L)
    assert(rows.length == 200)
    callerIsClean()
    val m = graft.ops.TinyLoop.modelCollect(df.groupBy("k").agg(sum("x").as("s")))
    assert(m.length == 7)
    callerIsClean()
  }

  test("a query planned concurrently with a live kmeans call keeps AQE") {
    // the end-to-end form of the contract: kmeans training on another
    // thread, the caller session planning queries the whole time. Every
    // plan built while the future is live must carry AdaptiveSparkPlan
    // and the 4-partition default. (If training finishes before the
    // first check, the loop still validates ≥1 plan — no false failure,
    // and the deterministic scope test above pins the mechanism.)
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val emb = Tables.embeddings(spark, sfDir)
    val fut = Future(GraftOps.kmeansCentroids(emb, k = 4, iters = 3).collect())
    var checked = 0
    while (!fut.isCompleted && checked < 50) {
      val q = (1 to 20).toDF("v").groupBy("v").count()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"),
        s"concurrent plan lost AQE during kmeans:\n$plan")
      callerIsClean()
      checked += 1
    }
    assert(Await.result(fut, 120.seconds).nonEmpty)
    callerIsClean()
  }
}
