package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}
import graft.functions.TopKAgg

/** Remaining SURVEY.md §2B surface: ORC source/sink with pushdown (named
  * explicitly in the north star), correlated scalar subqueries
  * (decorrelated by Catalyst), as-of joins via the window trick, and a
  * typed Aggregator UDAF.
  */
object AdvancedOps extends QueryModule {

  def queries: Seq[Q] = Seq(
    // ORC write -> ORC read with a pushed predicate -> aggregate. The
    // oracle runs the same aggregation over the original parquet — a
    // lossless roundtrip must agree. (DuckDB never sees the ORC file;
    // equality of results is the roundtrip proof.)
    Q(
      "q_orc_roundtrip",
      """SELECT l_returnflag,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_quantity > 25
        |GROUP BY l_returnflag ORDER BY l_returnflag"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_orc").toFile.getAbsolutePath
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_quantity")
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .filter(col("l_quantity") > 25) // pushed into the ORC scan
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // Parquet roundtrip under an explicit codec (zstd) with a tuned
    // row-group target — the storage knobs a 100 TB lake actually sets
    // (zstd ≈ gzip ratio at ~4x the speed; row-group size bounds both
    // scan parallelism and min/max-stat granularity). Lossless: the
    // oracle aggregates the original table.
    Q(
      "q_parquet_zstd_roundtrip",
      """SELECT o_orderpriority,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_totalprice > 100000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_zstd").toFile.getAbsolutePath
      Tables.orders(s, d)
        .select("o_orderpriority", "o_totalprice")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(dir)
      s.read.parquet(dir)
        .filter(col("o_totalprice") > 100000) // pushed into the zstd scan
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // Correlated scalar subquery — Catalyst decorrelates to an aggregate +
    // join (SURVEY.md §4.2); DuckDB runs the identical SQL.
    Q(
      "q_subquery_corr",
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey"""
    ) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("graft_customer_sq")
      s.sql(
        """SELECT c_custkey, c_acctbal FROM graft_customer_sq c
          |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM graft_customer_sq c2
          |                   WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    },

    // LATERAL correlated subquery join (Spark 3.2+ / ANSI): per-order
    // aggregate over the fact table, planned by Catalyst as a
    // decorrelated aggregate + join — the per-row-subquery surface
    // without per-row execution. Orders with no matching lineitem keep
    // a row (NULL max, count 0) on both engines.
    Q(
      "q_lateral_join",
      """SELECT o_orderkey, t.max_ship_date, t.n_items
        |FROM orders, LATERAL (
        |  SELECT CAST(MAX(l_shipdate) AS DATE) AS max_ship_date,
        |         COUNT(*) AS n_items
        |  FROM lineitem WHERE l_orderkey = o_orderkey) t
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey"""
    ) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_lat")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_lat")
      s.sql(
        """SELECT o_orderkey, t.max_ship_date, t.n_items
          |FROM graft_orders_lat, LATERAL (
          |  SELECT CAST(MAX(l_shipdate) AS DATE) AS max_ship_date,
          |         COUNT(*) AS n_items
          |  FROM graft_lineitem_lat WHERE l_orderkey = o_orderkey) t
          |WHERE o_orderkey < 1000
          |ORDER BY o_orderkey""".stripMargin)
    },

    // As-of join via the union+window trick (SURVEY.md §2B joins row):
    // for each purchase, the most recent prior-or-same-time view by the
    // same user. MAX over prior view timestamps == last prior view since
    // event time is monotone within the frame.
    Q(
      "q_asof_join",
      """WITH marked AS (
        |  SELECT event_id, user_id, ts, event_type,
        |         MAX(CASE WHEN event_type = 'view' THEN ts END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS last_view_ts
        |  FROM events)
        |SELECT event_id, user_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS purchase_sec,
        |       CAST(floor(epoch(last_view_ts)) AS BIGINT) AS last_view_sec
        |FROM marked WHERE event_type = 'purchase'
        |ORDER BY event_id"""
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("last_view_ts",
          max(when(col("event_type") === "view", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("purchase_sec"),
          unix_timestamp(col("last_view_ts")).as("last_view_sec"))
        .orderBy("event_id")
    },

    // The same as-of semantics through the CUSTOM OPERATOR path: logical
    // AsOfJoin node -> AsOfJoinStrategy -> AsOfJoinExec streaming merge
    // (injected via GraftExtensions in the Verify/Bench sessions). Same
    // oracle as q_asof_join — two implementations, one truth.
    Q(
      "q_asof_native",
      // RANGE frame (not ROWS): AsOfJoinExec matches ANY view with
      // ts <= purchase ts, including same-timestamp peers regardless of
      // event_id order — a RANGE frame over ts has exactly that semantics.
      """WITH marked AS (
        |  SELECT event_id, user_id, ts, event_type,
        |         MAX(CASE WHEN event_type = 'view' THEN ts END)
        |           OVER (PARTITION BY user_id ORDER BY ts
        |                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
        |  FROM events)
        |SELECT event_id, user_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS purchase_sec,
        |       CAST(floor(epoch(last_view_ts)) AS BIGINT) AS last_view_sec
        |FROM marked WHERE event_type = 'purchase'
        |ORDER BY event_id"""
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      graft.plans.AsOf.join(purchases, views, "user_id", "v_user", "ts", "v_ts")
        .select(
          col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("purchase_sec"),
          unix_timestamp(col("v_ts")).as("last_view_sec"))
        .orderBy("event_id")
    },

    // TypedImperativeAggregate: 10-bucket quantity histogram per flag —
    // bounded long[] buffer, one vector-add merge. Oracle spells the same
    // clamped floor((v - lo)/width) bucketing as conditional counts.
    Q(
      "q_histogram",
      {
        val buckets = (0 until 10).map { k =>
          s"COUNT(CASE WHEN GREATEST(LEAST(CAST(floor(l_quantity / 5.0) AS INT), 9), 0) = $k THEN 1 END) AS b$k"
        }.mkString(",\n        |       ")
        s"""SELECT l_returnflag,
           |       $buckets
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
      }
    ) { (s, d) =>
      import graft.functions.GraftFunctions
      val hist = GraftFunctions.histogram(col("l_quantity"), 0.0, 50.0, 10)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(hist.as("h"))
        .select(col("l_returnflag") +:
          (0 until 10).map(k => col("h").getItem(k).as(s"b$k")): _*)
        .orderBy("l_returnflag")
    },

    // Typed Aggregator UDAF: bounded top-5 prices per priority class. The
    // aggregated array is exploded to (group, rank, value) rows — the
    // driver's pandas comparator can't sort list columns, and the values-
    // only shape is insensitive to tie order inside the aggregator.
    Q(
      "q_udaf_topk",
      """SELECT o_orderpriority, CAST(rn AS INT) AS rnk,
        |       CAST(o_totalprice AS DOUBLE) AS price
        |FROM (SELECT o_orderpriority, o_totalprice,
        |             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC) AS rn
        |      FROM orders)
        |WHERE rn <= 5 ORDER BY o_orderpriority, rnk"""
    ) { (s, d) =>
      val top5 = udaf(new TopKAgg(5))
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(top5(col("o_totalprice")).as("top5"))
        .select(col("o_orderpriority"), posexplode(col("top5")).as(Seq("pos", "price")))
        .select(
          col("o_orderpriority"),
          (col("pos") + 1).cast("int").as("rnk"),
          col("price").cast("double"))
        .orderBy("o_orderpriority", "rnk")
    }
  )
}
