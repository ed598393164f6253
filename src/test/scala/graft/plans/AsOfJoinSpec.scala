package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    graft.TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before each left row, per key") {
    import spark.implicits._
    val quotes = Seq( // key, ts, px
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:30:00"), 105.0),
      (2L, ts("2024-01-01 10:00:00"), 50.0))
      .toDF("q_key", "q_ts", "px")
    val trades = Seq( // key, ts
      (1L, ts("2024-01-01 10:04:59")), // -> 100.0
      (1L, ts("2024-01-01 10:05:00")), // exact tie -> 101.0 (<=)
      (1L, ts("2024-01-01 11:00:00")), // -> 105.0
      (2L, ts("2024-01-01 09:59:59")), // before any quote -> null
      (3L, ts("2024-01-01 12:00:00"))) // key with no quotes -> null
      .toDF("t_key", "t_ts")
    val out = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select("t_key", "t_ts", "px")
      .orderBy("t_key", "t_ts")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
    assert(out == Seq(
      1L -> Some(100.0), 1L -> Some(101.0), 1L -> Some(105.0),
      2L -> None, 3L -> None))
  }

  test("null keys and timestamps never match, rows survive with nulls") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00"))),
      (None, Some(ts("2024-01-01 10:00:00"))),
      (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(ts("2024-01-01 09:00:00")), 7.0), (None, None, 8.0))
      .toDF("rk", "rt", "v")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("k", "v").collect()
    assert(out.length == 3)
    assert(out.count(row => !row.isNullAt(1) && row.getDouble(1) == 7.0) == 1)
    assert(out.count(_.isNullAt(1)) == 2)
  }

  test("physical plan uses AsOfJoinExec (custom strategy fired)") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("rk", "rt", "v")
    val plan = AsOf.join(l, r, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix; the required exchanges +
    // sorts around the merge are part of the contract.
    assert(plan.contains("AsOfJoin "), s"strategy did not fire:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no clustering:\n$plan")
    assert(plan.contains("Sort ["), s"no sort:\n$plan")
  }

  // Pins the zipPartitions co-partitioning assumption (AsOfJoinExec
  // requires identical partition counts on both sides): children arriving
  // with pre-existing INCOMPATIBLE partitionings — different partition
  // counts on the join key, a partitioning on the wrong key entirely —
  // must be re-clustered by EnsureRequirements, with AQE enabled, and
  // still produce the exact merge result. AsOfJoinExec.doExecute also
  // hard-fails on a count mismatch rather than silently mis-joining.
  test("co-partitioning holds under AQE with hostile pre-partitioned inputs") {
    import spark.implicits._
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:00:00"), 50.0),
      (3L, ts("2024-01-01 08:00:00"), 75.0))
      .toDF("q_key", "q_ts", "px")
      .repartition(7, col("q_key")) // wrong count for the session's 4
    val trades = Seq(
      (1L, ts("2024-01-01 10:04:59")),
      (1L, ts("2024-01-01 10:06:00")),
      (2L, ts("2024-01-01 11:00:00")),
      (3L, ts("2024-01-01 07:00:00")))
      .toDF("t_key", "t_ts")
      .repartition(3, col("t_ts")) // wrong key AND wrong count
    val out = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select("t_key", "t_ts", "px")
      .orderBy("t_key", "t_ts")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
    assert(out == Seq(
      1L -> Some(100.0), 1L -> Some(101.0),
      2L -> Some(50.0), 3L -> None))
  }

  test("native operator agrees with the window-trick rewrite on real events") {
    val sfDir = "/root/testdata/sf0.001"
    val windowed = graft.SparkEntry.queries("q_asof_join")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val native = graft.SparkEntry.queries("q_asof_native")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(windowed == native)
  }
}
