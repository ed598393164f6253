package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, QueryModule, Tables}

import Present._

/** Relational core (SURVEY.md §2B): scans, filters, every join type,
  * aggregations (incl. rollup/cube/grouping sets), window functions,
  * sort/limit/top-k, set operations.
  *
  * The reference has no query language at all (its only relational-ish
  * operator is the extension predicate at `/root/reference/main.go:73-80`);
  * this module IS the engine's declared relational surface, carried by
  * Catalyst built-ins so pushdown/pruning/join-selection/AQE come free.
  *
  * Scale notes (100 TB posture):
  *  - dimension joins follow the [[dimBroadcast]] policy: constant-
  *    bounded dims (`nation`, `region`, a filtered `part` list) carry an
  *    explicit `broadcast()` hint — no shuffle of the fact side —
  *    while linearly-scaling dims (supplier, customer) go UNHINTED;
  *  - fact-fact joins shuffle on their equi-keys only;
  *  - windows partition by high-cardinality keys (custkey/suppkey), never
  *    a global single-partition window except where semantics demand it;
  *  - every aggregate is a hash aggregate with map-side partials.
  */
object RelationalOps extends QueryModule {
  private val Dec = DecimalType(38, 10)

  /** Broadcast-hint policy for dimension join sides, in one place.
    *
    * `constantBounded = true` (nation, region, or a filter whose output
    * is a fixed fraction of a bounded catalog): force the hint — the
    * table can never outgrow broadcast range, and the hint removes any
    * dependence on estimator accuracy.
    *
    * `constantBounded = false` (supplier, customer — anything TPC-H
    * scales LINEARLY with the fact data): NO hint. A forced
    * `broadcast()` never degrades on its own — Spark attempts the build
    * at any size and the job dies at exactly the scale this engine
    * targets (sf100k supplier is ~100 GB). Unhinted, the static
    * planner's parquet size estimate (or AQE's measured stage size at
    * runtime) picks the broadcast while the dim actually fits — the
    * same plan at test SFs, pinned by PlanHygieneSpec — and degrades to
    * a keyed shuffle join past threshold instead of an OOM.
    */
  private[ops] def dimBroadcast(dim: DataFrame, constantBounded: Boolean): DataFrame =
    if (constantBounded) broadcast(dim) else dim

  def queries: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // scan / project / filter
    // ------------------------------------------------------------------
    Q(
      "q_scan_project",
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
      // the ORDER BY covers all output columns so ties are identical rows.
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    Q(
      "q_filter_predicates",
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE (o_orderstatus = 'F' OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |  AND o_totalprice BETWEEN 1000 AND 200000
        |  AND NOT (o_custkey % 10 = 0)
        |ORDER BY o_orderkey"""
    ) { (s, d) =>
      Tables.orders(s, d)
        .filter(
          (col("o_orderstatus") === "F" ||
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")) &&
            col("o_totalprice").between(1000, 200000) &&
            !(col("o_custkey") % 10 === 0))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ------------------------------------------------------------------
    // joins
    // ------------------------------------------------------------------
    Q(
      "q_join_inner",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name"""
    ) { (s, d) =>
      // FACT-FIRST join order: lineitem is the streaming side throughout,
      // so the planner's build sides are orders → customer → nation
      // (each smaller than the last). The dim-first spelling let the
      // size estimator pick LINEITEM as a broadcast build (600k-row
      // hashed relation, the measured 381ms of this query) — and at
      // 100 TB the fact side must never be a build side at all.
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .boundedSort("n_name")
    },

    Q(
      "q_join_left",
      """SELECT c_custkey,
        |       COUNT(o_orderkey) AS n_orders,
        |       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 0) AS DOUBLE) AS total_spent
        |FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey"""
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast(Dec)), lit(0).cast(Dec))
            .cast("double").as("total_spent"))
        .orderBy("c_custkey")
    },

    Q(
      "q_join_right",
      """SELECT o_orderkey, COUNT(l_linenumber) AS n_lines
        |FROM lineitem
        |RIGHT JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"), "right")
        .groupBy("o_orderkey")
        .agg(count(col("l_linenumber")).as("n_lines"))
        .orderBy("o_orderkey")
    },

    Q(
      "q_join_full",
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey, c_cnt, s_cnt
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nationkey"""
    ) { (s, d) =>
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("cnk"))
        .agg(count(lit(1)).as("c_cnt"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("s_cnt"))
      c.join(su, col("cnk") === col("snk"), "full_outer")
        .select(coalesce(col("cnk"), col("snk")).as("nationkey"), col("c_cnt"), col("s_cnt"))
        .orderBy("nationkey")
    },

    Q(
      "q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey"""
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q(
      "q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey"""
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q(
      "q_join_cross",
      """SELECT a.r_name AS r1, b.r_name AS r2
        |FROM region a CROSS JOIN region b
        |ORDER BY r1, r2"""
    ) { (s, d) =>
      val a = Tables.region(s, d).select(col("r_name").as("r1"))
      val b = Tables.region(s, d).select(col("r_name").as("r2"))
      a.crossJoin(b).orderBy("r1", "r2")
    },

    // theta / non-equi join (BNLJ on a small dimension — fine at any SF
    // because nation is 25 rows regardless of scale factor)
    Q(
      "q_join_theta",
      """SELECT a.n_name AS n1, b.n_name AS n2
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        |ORDER BY n1, n2"""
    ) { (s, d) =>
      val a = Tables.nation(s, d).select(
        col("n_name").as("n1"), col("n_nationkey").as("k1"), col("n_regionkey").as("g1"))
      val b = Tables.nation(s, d).select(
        col("n_name").as("n2"), col("n_nationkey").as("k2"), col("n_regionkey").as("g2"))
      a.join(b, col("g1") === col("g2") && col("k1") < col("k2"))
        .select("n1", "n2")
        .orderBy("n1", "n2")
    },

    // null-safe equality (<=> / IS NOT DISTINCT FROM) over columns that
    // are genuinely null on full-outer misses.
    Q(
      "q_nullsafe_eq",
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey,
        |       c_cnt IS NOT DISTINCT FROM s_cnt AS same_count,
        |       c_cnt IS DISTINCT FROM s_cnt AS diff_count
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nationkey"""
    ) { (s, d) =>
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("cnk"))
        .agg(count(lit(1)).as("c_cnt"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("s_cnt"))
      c.join(su, col("cnk") === col("snk"), "full_outer")
        .select(
          coalesce(col("cnk"), col("snk")).as("nationkey"),
          (col("c_cnt") <=> col("s_cnt")).as("same_count"),
          (!(col("c_cnt") <=> col("s_cnt"))).as("diff_count"))
        .orderBy("nationkey")
    },

    // interval range join: event pairs of the same user within 10 minutes
    // (bounded to user_id < 50 so the pair count stays fixed per SF).
    Q(
      "q_join_range",
      """SELECT a.event_id AS e1, b.event_id AS e2,
        |       CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS gap_sec
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |WHERE a.user_id < 50
        |ORDER BY e1, e2"""
    ) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("user_id") < 50)
      val a = ev.select(col("event_id").as("e1"), col("user_id").as("u1"), col("ts").as("t1"))
      val b = ev.select(col("event_id").as("e2"), col("user_id").as("u2"), col("ts").as("t2"))
      a.join(b,
        col("u1") === col("u2") &&
          col("t2") > col("t1") &&
          col("t2") <= col("t1") + expr("INTERVAL 10 MINUTES"))
        .select(
          col("e1"), col("e2"),
          (unix_timestamp(col("t2")) - unix_timestamp(col("t1"))).as("gap_sec"))
        .orderBy("e1", "e2")
    },

    Q(
      "q_join_broadcast",
      """SELECT p_brand,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          Exact.dsum(col("l_extendedprice")).as("total_price"))
        .orderBy("p_brand")
    },

    // TPC-H Q3 shape (shipping priority): segment-filtered customer joins
    // date-filtered orders and lineitem, top-10 open orders by revenue.
    Q(
      "q_tpch_q3",
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue,
        |       CAST(o_orderdate AS DATE) AS orderdate,
        |       o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10"""
    ) { (s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(
          col("l_orderkey"), col("revenue"),
          to_date(col("o_orderdate")).as("orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q18 shape (large-volume customers): join against a grouped-
    // HAVING subquery over the fact table — the AQE join-planning stressor
    // beyond Q3's 3-way (the aggregated side's size is only known at
    // runtime, so static planning can't pick the join strategy). Sums stay
    // plain doubles: l_quantity is integral (verified on all SFs), so
    // sums are exact in both engines. Threshold 200 ≈ top-1% of orders.
    Q(
      "q_tpch_q18",
      """SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS orderdate,
        |       o_totalprice,
        |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100"""
    ) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val big = li
        .groupBy(col("l_orderkey").as("bk"))
        .agg(sum(col("l_quantity")).as("tq"))
        .filter(col("tq") > 200)
        .select("bk")
      // FACT-FIRST (the q_join_inner lesson): lineitem streams, the
      // semi-filtered orders and customer are the build sides — the
      // customer-first spelling let the estimator broadcast-build the
      // fact table itself.
      li
        .join(Tables.orders(s, d)
            .join(big, col("o_orderkey") === col("bk"), "left_semi"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(
          col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).cast("double").as("sum_qty"))
        .select(
          col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // TPC-H Q10 shape (returned-item reporting): which customers
    // returned the most revenue in a quarter. Fact filters (date window,
    // return flag) applied below the joins; nation broadcast; top-20 by
    // revenue via sort+limit (TakeOrderedAndProject). Revenue is the
    // exact-decimal sum, so the doubles match bit-for-bit.
    Q(
      "q_tpch_q10",
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN orders   ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1995-10-01'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20"""
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("c_acctbal"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q5 shape (local supplier volume): the classic 6-way
    // join-order stressor — region→nation restricts BOTH the customer
    // and the supplier side, and the c_nationkey = s_nationkey
    // correlation only binds after the fact joins. Dimensions broadcast;
    // the two fact joins shuffle on their keys; the date filter sits
    // below everything.
    Q(
      "q_tpch_q5",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name"""
    ) { (s, d) =>
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      // FACT-FIRST join order (the q_join_inner lesson): lineitem
      // streams through every join; the build sides are the
      // date-filtered orders, customer, supplier, nation — never the
      // fact table (the dim-first spelling let the size estimator pick
      // lineitem itself as a broadcast build).
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(dimBroadcast(Tables.supplier(s, d), constantBounded = false),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .boundedSortCols(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q4 shape (order priority checking): EXISTS-style semi join
    // from a date-windowed orders slice into the fact table with a
    // correlated non-equi predicate (the synthetic schema has no
    // l_commitdate/l_receiptdate, so "late" = shipped > 90 days after
    // order — same correlated-EXISTS plan shape). Semi join never
    // duplicates orders, so the counts are join-multiplicity-safe.
    Q(
      "q_tpch_q4",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    ) { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(
          col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q13 shape (customer order-count distribution): outer join
    // with a join-condition filter (NOT a post-filter — the filter must
    // ride the join condition or the outer semantics change), then a
    // second aggregation over the first's results. Two shuffles, both on
    // scale-growing keys.
    Q(
      "q_tpch_q13",
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT",
          "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .boundedSortCols(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q7 shape (volume shipping between two nations): the fact
    // table joined through BOTH dimension paths (customer→nation and
    // supplier→nation) with the nation-pair predicate filtering the two
    // broadcast dimension subtrees down to one nation each BEFORE the
    // fact joins — the plan never carries rows outside the two nations.
    Q(
      "q_tpch_q7",
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |       CAST(year(l_shipdate) AS INT) AS l_year,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        |   OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
        |GROUP BY cn.n_name, sn.n_name, l_year
        |ORDER BY cust_nation, supp_nation, l_year"""
    ) { (s, d) =>
      val names = Seq("NATION_1", "NATION_2")
      val nat = Tables.nation(s, d).filter(col("n_name").isin(names: _*))
      val cust = Tables.customer(s, d)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(dimBroadcast(cust, constantBounded = false),
          col("o_custkey") === col("c_custkey"))
        .join(dimBroadcast(supp, constantBounded = false),
          col("l_suppkey") === col("s_suppkey"))
        .filter(
          (col("cust_nation") === "NATION_1" && col("supp_nation") === "NATION_2") ||
            (col("cust_nation") === "NATION_2" && col("supp_nation") === "NATION_1"))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(
          Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    },

    // TPC-H Q12 shape (shipping-priority classes): fact⋈orders with a
    // date-windowed fact slice, CASE-bucketed counts per group (the
    // synthetic schema has no l_shipmode, so the group key is
    // l_returnflag and the classes split on o_orderpriority — same
    // join + conditional-aggregation plan shape). Counts are exact
    // BIGINTs; one shuffle join on the order key plus the final 3-group
    // aggregate with map-side partials.
    Q(
      "q_tpch_q12",
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag"""
    ) { (s, d) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // TPC-H Q14 shape (promotion effect): month-windowed fact joined to
    // the part dimension, ratio of CASE-gated revenue to total revenue.
    // Both sums ride ONE aggregation pass (conditional aggregation, not
    // two scans); division order and rounding are spelled identically on
    // both sides so the doubles match bit-for-bit.
    Q(
      "q_tpch_q14",
      """SELECT floor(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0 END AS DECIMAL(38,10))) AS DOUBLE)
        |             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                 AS DECIMAL(38,10))) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS promo_revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'"""
    ) { (s, d) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(
          Exact.round6(lit(100.0) * Exact.dsum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0))) / Exact.dsum(rev)).as("promo_revenue"),
          count(lit(1)).as("n_items"))
    },

    // TPC-H Q21 shape (suppliers who kept orders waiting): the hardest
    // join-planning stressor in the suite — a semi AND an anti SELF-join
    // on the fact table, each with a non-equi other-supplier predicate,
    // under a dimension filter. The synthetic schema has no
    // l_receiptdate/l_commitdate, so "late" = shipped after a cutoff
    // date — identical plan shape (LeftSemi + LeftAnti on l_orderkey
    // with l_suppkey <>, pinned in PlanHygieneSpec). The supplier→nation
    // dimension broadcasts and prunes l1 before the self-joins; orders'
    // status filter rides a semi join so fact rows are never duplicated.
    Q(
      "q_tpch_q21",
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > TIMESTAMP '2000-06-30'
        |  AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > TIMESTAMP '2000-06-30')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100"""
    ) { (s, d) =>
      val cutoff = lit("2000-06-30").cast("timestamp")
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      val suppNat = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      li.filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_suppkey")
        .join(dimBroadcast(suppNat, constantBounded = false),
          col("l_suppkey") === col("s_suppkey"))
        // left_semi where the oracle spells an inner join: equivalent
        // BECAUSE o_orderkey is unique in orders (each l1 row matches at
        // most one orders row, so the inner join never duplicates fact
        // rows). The uniqueness is an enforced fixture invariant —
        // pinned by PlanHygieneSpec's "fixture invariants" test — not an
        // implicit assumption.
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
            .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
          "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // TPC-H Q2 shape (minimum-cost supplier): the correlated-min
    // stressor — for each part, only suppliers matching the REGIONAL
    // minimum supply cost survive. The synthetic schema has no partsupp,
    // so (part, supplier, cost) is derived from lineitem as the minimum
    // observed unit price per (l_partkey, l_suppkey) — the correlated-
    // aggregate plan shape (per-part min + equality join back, the
    // decorrelation Catalyst produces for the subquery spelling) is
    // identical. The double equality is exact: both sides compare the
    // same IEEE division results, and MIN picks one of them.
    Q(
      "q_tpch_q2",
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         MIN(l_extendedprice / l_quantity) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |eligible AS (
        |  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, s_acctbal, n_name
        |  FROM ps
        |  JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |minc AS (SELECT ps_partkey AS mk, MIN(ps_supplycost) AS mc
        |         FROM eligible GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |       floor(ps_supplycost * 1e6 + 0.5) / 1e6 AS supplycost
        |FROM eligible
        |JOIN minc ON ps_partkey = mk AND ps_supplycost = mc
        |JOIN part ON p_partkey = ps_partkey
        |WHERE p_size <= 15 AND p_type = 'LARGE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100"""
    ) { (s, d) =>
      // the part filter selects WHOLE partkeys, and every downstream
      // quantity (per-part min, probe, output) is per-part — so the
      // partsupp derivation runs on the part-filtered fact slice: the
      // same per-part results as deriving from all of lineitem (what
      // the oracle spells), with the fact scan pruned by the broadcast
      // filter BEFORE the aggregation instead of after
      val redParts = broadcast(Tables.part(s, d)
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
        .select("p_partkey", "p_name"))
      val ps = Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(redParts, col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      val euroSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val eligible = ps
        .join(dimBroadcast(euroSupp, constantBounded = false),
          col("ps_suppkey") === col("s_suppkey"))
        .localCheckpoint() // read once by both the min pass and the probe
      val minc = eligible.groupBy(col("ps_partkey").as("mk"))
        .agg(min(col("ps_supplycost")).as("mc"))
      eligible
        .join(minc, col("ps_partkey") === col("mk") && col("ps_supplycost") === col("mc"))
        .join(redParts, col("p_partkey") === col("ps_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"),
          Exact.round6(col("ps_supplycost")).as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

    // TPC-H Q9 shape (product-type profit share): the 7-way join-order
    // stressor — fact × derived partsupp (two-column key) × part
    // (like-filter) × supplier × orders × nation, profit aggregated by
    // nation and order year. partsupp is derived from lineitem (min
    // observed unit price) as in Q2 above; the like-filtered part dim
    // broadcasts and prunes the fact scan early, the ps join is the one
    // genuine fact-fact shuffle. Each amount is rounded to 6 decimals
    // BEFORE the exact-decimal sum, and the rounding is spelled as
    // floor(x*1e6 + 0.5)/1e6 on BOTH sides: engine round() builtins
    // disagree on .5-boundary doubles (HALF_UP over shortest-repr vs
    // exact-expansion rounding — observed as a 1e-6 divergence on one
    // group), while the floor spelling is the same IEEE mul/add/floor/
    // divide sequence on both engines, and the resulting ≤6-decimal
    // double converts to DECIMAL identically everywhere.
    Q(
      "q_tpch_q9",
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         MIN(l_extendedprice / l_quantity) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT nation, o_year,
        |       CAST(SUM(CAST(amount AS DECIMAL(38,10))) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |         CAST(year(o_orderdate) AS INT) AS o_year,
        |         floor((l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity) * 1e6 + 0.5) / 1e6 AS amount
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC"""
    ) { (s, d) =>
      // the p_name filter keeps WHOLE partkeys, so the partsupp
      // derivation runs on the part-filtered slice (identical per-pair
      // minima to deriving from all of lineitem, which the oracle
      // spells) — and the pair-bounded ps table then rejoins WITHOUT a
      // fact-side exchange (AQE broadcasts it at observed size; past
      // broadcast range it degrades to the keyed shuffle)
      val redParts = broadcast(Tables.part(s, d)
        .filter(col("p_name").like("%red%")).select("p_partkey"))
      val slice = Tables.lineitem(s, d)
        .join(redParts, col("p_partkey") === col("l_partkey"))
      val ps = slice
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      val amount = floor((col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity")) * lit(1e6) + lit(0.5)) / lit(1e6)
      slice
        .join(dimBroadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
            constantBounded = false),
          col("s_suppkey") === col("l_suppkey"))
        .join(ps,
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          amount.as("amount"))
        .groupBy("nation", "o_year")
        .agg(Exact.dsum(col("amount")).as("sum_profit"))
        // bounded domain: 25 nations x order-date years
        .boundedSortCols(col("nation"), col("o_year").desc)
    },

    // TPC-H Q8 shape (national market share): the 8-way join-order
    // stressor — the fact table reaches nation through BOTH the
    // customer path (region-restricted) and the supplier path (share
    // numerator), with a conditional share ratio per order year. Part/
    // supplier/nation dims broadcast; the customer restriction joins
    // after the fact joins (planner's choice at scale); numerator and
    // denominator ride ONE aggregation pass as exact-decimal
    // conditional sums, divided and rounded identically on both sides.
    Q(
      "q_tpch_q8",
      """WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part     ON p_partkey = l_partkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation cn ON cn.n_nationkey = c_nationkey
        |  JOIN region   ON r_regionkey = cn.n_regionkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation sn ON sn.n_nationkey = s_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01')
        |SELECT o_year,
        |       floor(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END AS DECIMAL(38,10))) AS DOUBLE)
        |             / CAST(SUM(CAST(volume AS DECIMAL(38,10))) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mkt_share,
        |       COUNT(*) AS n_items
        |FROM vol GROUP BY o_year ORDER BY o_year"""
    ) { (s, d) =>
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("cnk"))),
          col("c_nationkey") === col("cnk"))
        .select("c_custkey")
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_type") === "PROMO").select("p_partkey")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .join(asiaCust, col("c_custkey") === col("o_custkey"), "left_semi")
        .join(dimBroadcast(supp, constantBounded = false),
          col("s_suppkey") === col("l_suppkey"))
        .select(year(col("o_orderdate")).cast("int").as("o_year"),
          volume.as("volume"), col("supp_nation"))
        .groupBy("o_year")
        .agg(
          Exact.round6(Exact.dsum(when(col("supp_nation") === "NATION_5", col("volume"))
              .otherwise(lit(0))) / Exact.dsum(col("volume"))).as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    },

    // TPC-H Q15 shape (top supplier): a per-supplier revenue aggregate
    // probed against its own MAX — the scalar-subquery-over-a-view
    // stressor; ties would return multiple rows, exactly as the spec
    // demands. The quarter slice is aggregated ONCE (checkpointed,
    // supplier-bounded) and reused by both the max and the probe; the
    // equality compares the identical exact-decimal doubles.
    Q(
      "q_tpch_q15",
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, floor(total_revenue * 1e6 + 0.5) / 1e6 AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey"""
    ) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
        .localCheckpoint() // supplier-bounded; feeds both max and probe
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev
        .crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(dimBroadcast(Tables.supplier(s, d).select("s_suppkey", "s_name"),
            constantBounded = false),
          col("s_suppkey") === col("supplier_no"))
        .select(col("s_suppkey"), col("s_name"),
          Exact.round6(col("total_revenue")).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated-
    // aggregate-on-the-FACT-table stressor — each lineitem compares its
    // quantity against 0.2× the average quantity OF ITS OWN PART. The
    // per-part average is computed AFTER the broadcast part filter
    // (identical values: the filter selects whole partkeys, and the
    // average is per partkey), so the decorrelated aggregate runs over
    // the filtered slice, not the whole fact table. The per-part
    // average rides the exact decimal-sum recipe on BOTH sides, so the
    // 0.2× threshold compare is cross-engine exact for ANY l_quantity
    // distribution — no integrality assumption.
    Q(
      "q_tpch_q17",
      """SELECT floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) / 7.0 * 1e6 + 0.5) / 1e6 AS avg_yearly,
        |       COUNT(*) AS n_small
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size <= 10
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / COUNT(l_quantity))
        |    FROM lineitem l2
        |    WHERE l2.l_partkey = lineitem.l_partkey)"""
    ) { (s, d) =>
      val slice = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
            .select("p_partkey")),
          col("p_partkey") === col("l_partkey"))
      val qlim = slice.groupBy(col("l_partkey").as("ak"))
        .agg((lit(0.2) * Exact.davg(col("l_quantity"))).as("qlim"))
      slice
        .join(qlim, col("ak") === col("l_partkey"))
        .filter(col("l_quantity") < col("qlim"))
        .agg(
          Exact.round6(Exact.dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    },

    // TPC-H Q19 shape (discounted revenue): the DISJUNCTIVE join
    // predicate stressor — three OR'd conjunct groups spanning both join
    // sides. The planner must keep the p_partkey equality as the join
    // key and evaluate the disjunction as a residual condition (naive
    // handling degrades to a cartesian; the blanket no-cartesian spec
    // guards that), with the part side broadcast.
    Q(
      "q_tpch_q19",
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""
    ) { (s, d) =>
      val bq = (b: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === b &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("p_partkey") === col("l_partkey") &&
            (bq("Brand#1", 1, 5, 1, 11) ||
              bq("Brand#2", 1, 10, 10, 20) ||
              bq("Brand#3", 1, 15, 20, 30)))
        .agg(
          Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // TPC-H Q22 shape (inactive wealthy customers): a scalar aggregate
    // subquery gating the scan (balance above the positive-balance
    // average) plus an anti join against recent orders ("no orders since
    // 2000" stands in for Q22's seven-year window; the synthetic
    // customer has no phone, so nationkey plays the country-code group).
    // The average threshold is computed with the exact-decimal-sum
    // recipe — a plain AVG(double) differs across engines in the low
    // bits and can flip boundary customers.
    Q(
      "q_tpch_q22",
      """WITH ab AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) AS totacctbal
        |FROM customer, ab
        |WHERE c_acctbal > ab.avg_bal
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey"""
    ) { (s, d) =>
      val cust = Tables.customer(s, d)
      val ab = cust.filter(col("c_acctbal") > 0)
        .agg(Exact.davg(col("c_acctbal")).as("avg_bal"))
      cust
        .crossJoin(broadcast(ab))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          Exact.dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_nationkey")
    },

    // TPC-H Q6 shape (forecast revenue): pure scan-filter-aggregate, the
    // pushdown/codegen benchmark classic. One-row result.
    Q(
      "q_tpch_q6",
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,10))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
        .agg(
          Exact.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    },

    // ------------------------------------------------------------------
    // aggregations
    // ------------------------------------------------------------------
    Q(
      "q_agg_q1",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10))) AS DOUBLE) AS sum_charge,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |       CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Exact.dsum(col("l_quantity")).as("sum_qty"),
          Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
          Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          Exact.davg(col("l_quantity")).as("avg_qty"),
          Exact.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .boundedSort("l_returnflag", "l_linestatus")
    },

    Q(
      "q_agg_countdistinct",
      """SELECT o_orderpriority,
        |       COUNT(DISTINCT o_custkey) AS n_customers,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    ) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // HLL++ sketch counts differ from DuckDB's approx sketch by design, so
    // the raw approx values can't be hash-compared. Instead the query
    // emits the EXACT distinct counts (oracle-checkable) plus a boolean
    // asserting the HLL estimate landed within 10% relative error (a
    // 5-sigma margin at rsd=0.02) — the oracle's constant `true` makes any
    // out-of-tolerance sketch a hash mismatch. The ScalaTest spec
    // additionally checks the raw estimates.
    Q(
      "q_agg_approx_distinct",
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |       true AS hll_within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("exact_orders"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .select(
          col("l_returnflag"), col("exact_orders"), col("exact_parts"),
          (abs(col("approx_orders") - col("exact_orders")) <=
            col("exact_orders") * 0.10 &&
           abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.10).as("hll_within_10pct"))
        .orderBy("l_returnflag")
    },

    Q(
      "q_agg_stats",
      """WITH t AS (
        |  SELECT l_linestatus,
        |         COUNT(*) AS n,
        |         CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
        |         CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sum_x,
        |         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sum_x2
        |  FROM lineitem GROUP BY l_linestatus)
        |SELECT l_linestatus, n, min_price, max_price,
        |       (sum_x2 - sum_x * sum_x / n) / (n - 1) AS var_samp_price,
        |       sqrt((sum_x2 - sum_x * sum_x / n) / (n - 1)) AS stddev_price
        |FROM t ORDER BY l_linestatus"""
    ) { (s, d) =>
      val x = col("l_extendedprice")
      val t = Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          min(x).cast("double").as("min_price"),
          max(x).cast("double").as("max_price"),
          Exact.dsum(x).as("sum_x"),
          // price^2 ~ 1e10 per value: past dsum's two-long per-value
          // bound (its loud error names this spelling)
          Exact.dsumWide(x * x).as("sum_x2"))
      t.select(
        col("l_linestatus"), col("n"), col("min_price"), col("max_price"),
        Exact.dvarSamp(col("sum_x"), col("sum_x2"), col("n")).as("var_samp_price"),
        sqrt(Exact.dvarSamp(col("sum_x"), col("sum_x2"), col("n"))).as("stddev_price"))
        .orderBy("l_linestatus")
    },

    // Bivariate statistics (covariance / Pearson correlation) from exact
    // decimal sums + an IEEE double formula with identical parenthesizing
    // on both sides — the built-in corr/covar aggregates accumulate in
    // partition order and are NOT cross-engine deterministic (same reason
    // q_agg_stats avoids built-in stddev). Per-row double products are
    // deterministic; only their SUM needs the decimal trick.
    Q(
      "q_agg_corr",
      """WITH t AS (
        |  SELECT l_returnflag,
        |         CAST(COUNT(*) AS DOUBLE) AS n,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
        |         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |       (sxy - sx * sy / n) / (n - 1) AS covar_samp_qp,
        |       (n * sxy - sx * sy) /
        |         (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qp
        |FROM t ORDER BY l_returnflag"""
    ) { (s, d) =>
      val q = col("l_quantity")
      val p = col("l_extendedprice")
      val t = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          Exact.dsum(q).as("sx"),
          Exact.dsum(p).as("sy"),
          Exact.dsum(q * p).as("sxy"),
          Exact.dsum(q * q).as("sxx"),
          // price^2 ~ 1e10 per value: past dsum's two-long per-value
          // bound (its loud error names this spelling)
          Exact.dsumWide(p * p).as("syy"))
      t.select(
        col("l_returnflag"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - lit(1)))
          .as("covar_samp_qp"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_qp"))
        .orderBy("l_returnflag")
    },

    // Higher central moments (population skewness / excess kurtosis) from
    // raw power sums — same exact-decimal strategy as q_agg_corr: the
    // built-ins accumulate in partition order; these are order-free sums
    // plus an identically-parenthesized IEEE formula. l_quantity ≤ 50 so
    // x⁴ sums sit comfortably inside DECIMAL(38,10).
    Q(
      "q_agg_moments",
      """WITH t AS (
        |  SELECT l_returnflag,
        |         CAST(COUNT(*) AS DOUBLE) AS n,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS s2,
        |         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS s3,
        |         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT l_returnflag, n, s1 / n AS mu, s2, s3, s4 FROM t),
        |c AS (
        |  SELECT l_returnflag, n, mu,
        |         s2 / n - mu * mu AS m2,
        |         s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu AS m3,
        |         s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu AS m4
        |  FROM m)
        |SELECT l_returnflag,
        |       m3 / (m2 * sqrt(m2)) AS skewness,
        |       m4 / (m2 * m2) - 3 AS kurtosis
        |FROM c ORDER BY l_returnflag"""
    ) { (s, d) =>
      val x = col("l_quantity")
      val t = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          Exact.dsum(x).as("s1"),
          Exact.dsum(x * x).as("s2"),
          Exact.dsum(x * x * x).as("s3"),
          Exact.dsum(x * x * x * x).as("s4"))
      val mu = col("s1") / col("n")
      val m2 = col("s2") / col("n") - mu * mu
      val m3 = col("s3") / col("n") - lit(3) * mu * (col("s2") / col("n")) +
        lit(2) * mu * mu * mu
      val m4 = col("s4") / col("n") - lit(4) * mu * (col("s3") / col("n")) +
        lit(6) * mu * mu * (col("s2") / col("n")) - lit(3) * mu * mu * mu * mu
      t.select(
        col("l_returnflag"),
        (m3 / (m2 * sqrt(m2))).as("skewness"),
        (m4 / (m2 * m2) - lit(3)).as("kurtosis"))
        .orderBy("l_returnflag")
    },

    Q(
      "q_agg_rollup",
      """SELECT CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS INT) AS gid,
        |       COALESCE(n_name, 'ALL') AS n_name,
        |       COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
        |       COUNT(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY gid, n_name, c_mktsegment"""
    ) { (s, d) =>
      // rollup().agg(grouping(...)) + a post-agg select of the group
      // columns trips Spark's ambiguous-self-join heuristic when a join
      // sits upstream; SQL text resolves cleanly, so register views and
      // express the rollup in Spark SQL (same Catalyst plan).
      Tables.customer(s, d).createOrReplaceTempView("graft_customer_ru")
      Tables.nation(s, d).createOrReplaceTempView("graft_nation_ru")
      s.sql(
        """SELECT CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS INT) AS gid,
          |       COALESCE(n_name, 'ALL') AS n_name,
          |       COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
          |       COUNT(*) AS n_customers,
          |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) AS sum_acctbal
          |FROM graft_customer_ru JOIN graft_nation_ru ON c_nationkey = n_nationkey
          |GROUP BY ROLLUP(n_name, c_mktsegment)
          |ORDER BY gid, n_name, c_mktsegment""".stripMargin)
    },

    Q(
      "q_agg_cube",
      """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        |       COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus"))).cast("int").as("gid"),
          count(lit(1)).as("n"),
          Exact.dsum(col("l_quantity")).as("sum_qty"))
        .select(
          col("gid"),
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("gid", "l_returnflag", "l_linestatus")
    },

    Q(
      "q_agg_groupingsets",
      """SELECT CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
        |       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
        |       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |       COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus, o_orderpriority"""
    ) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_gs")
      s.sql(
        """SELECT CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
          |       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
          |       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
          |       COUNT(*) AS n
          |FROM graft_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)
    },

    // ------------------------------------------------------------------
    // window functions
    // ------------------------------------------------------------------
    Q(
      "q_window_topk",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn"""
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },

    // rank/dense_rank partition by o_custkey (scales with the data; ~1.5k
    // distinct per 15k orders) — a scale-fixed key like o_orderstatus (3
    // values) would funnel the whole table into 3 window tasks at 100 TB.
    // PlanHygieneSpec enforces this for every registered window. Ties are
    // still exercised: a customer's orders repeat priorities.
    Q(
      "q_window_rank",
      """SELECT o_orderkey, o_custkey, o_orderpriority,
        |       CAST(RANK()       OVER w AS INT) AS rnk,
        |       CAST(DENSE_RANK() OVER w AS INT) AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
        |ORDER BY o_orderkey"""
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
      Tables.orders(s, d)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .orderBy("o_orderkey")
    },

    Q(
      "q_window_lag",
      """SELECT o_custkey, o_orderkey,
        |       LAG(o_totalprice)  OVER w AS prev_price,
        |       LEAD(o_totalprice) OVER w AS next_price,
        |       CAST(date_diff('day', CAST(LAG(o_orderdate) OVER w AS DATE),
        |                             CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey"""
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          datediff(to_date(col("o_orderdate")), to_date(lag("o_orderdate", 1).over(w)))
            .as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q(
      "q_window_moving",
      // lineitem has no short unique key (dup (orderkey, linenumber) pairs
      // exist). The frame ordering is deterministic-up-to-output: rows
      // tied on (shipdate, orderkey, linenumber, quantity) agree on every
      // OUTPUT column AND on the summed column, so permuting a tie group
      // leaves each position's prefix sum and each position's output row
      // unchanged — the result multiset is engine-order-independent
      // without dragging the two otherwise-unread tie-break columns
      // (l_partkey, l_extendedprice) through scan, shuffle, and sort.
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,10)))
        |            OVER (PARTITION BY l_suppkey
        |                  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_quantity, moving_qty"""
    ) { (s, d) =>
      // Spelled as a PREFIX DIFFERENCE, not a sliding frame: Spark's
      // window frames have no retract path, so ROWS BETWEEN 2 PRECEDING
      // re-initializes and re-adds the whole frame on every row, while
      // the unbounded-preceding running sum is incremental (one add per
      // row) and the 3-back lag reads an already-computed value. Both
      // window expressions share one partition+order, so the plan still
      // pays a single exchange+sort. The running sum is a plain LONG:
      // l_quantity is an integral count (TPC-H domain 1..50; the guard
      // below fails loudly on any non-integral value so a foreign
      // corpus can never silently truncate), so cumLong − cumLong₋₃ is
      // the exact frame sum, and a 3-row integer sum ≤ a few hundred
      // casts to double identically to the oracle's
      // CAST(SUM(DECIMAL(38,10)) AS DOUBLE). Long arithmetic replaced
      // the r9 Decimal128 accumulator (16-byte UnsafeRow traffic +
      // decimal add/subtract per row — measured ~25% of the window
      // job, PLANS.md r15 A/B); overflow would need ~1.8e17 rows in
      // one supplier partition, so ANSI-checked long add never trips.
      // (l_quantity is non-null on this table; an all-null prefix
      // would distinguish the prefix-difference from the frame sum.)
      // (A packed single binary sort key — sign-flipped big-endian
      // concatenation — was A/B'd here in r15 and LOST: the per-row
      // byte[] allocation plus wider variable-length UnsafeRows cost
      // more than the shorter comparator saved; PLANS.md r15. The win
      // came from dropping the two order-only tie-break columns
      // entirely — see the oracle comment — and from the LONG sum.)
      val ord = Seq(col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      val wcum = Window.partitionBy("l_suppkey").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wlag = Window.partitionBy("l_suppkey").orderBy(ord: _*)
      val qtyLong = when(col("l_quantity") =!= col("l_quantity").cast("long").cast("double"),
        raise_error(concat(lit("q_window_moving: non-integral l_quantity "),
          col("l_quantity").cast("string"),
          lit(" — the LONG running sum requires integral quantities; " +
            "use the decimal spelling for fractional corpora"))))
        .otherwise(col("l_quantity").cast("long"))
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"), qtyLong.as("__graft_qty"))
        // RANGE-partition on the window's partition key up front: it
        // satisfies the window's ClusteredDistribution (no hash
        // exchange), and because the presentation ORDER BY leads with
        // the same key, the final sort is LOCAL — the r9 plan paid a
        // second full exchange + boundary-sampling pass re-sorting the
        // whole output (the measured 2.5x-vs-DuckDB residual).
        .repartitionByRange(col("l_suppkey"))
        .withColumn("__graft_cum", sum(col("__graft_qty")).over(wcum))
        .withColumn("__graft_cum3", lag(col("__graft_cum"), 3).over(wlag))
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("__graft_cum") - coalesce(col("__graft_cum3"), lit(0L)))
            .cast("double").as("moving_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "moving_qty")
    },

    Q(
      "q_window_range",
      """SELECT event_id,
        |       CAST(COUNT(*) OVER (PARTITION BY user_id
        |            ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_hour
        |FROM events
        |ORDER BY event_id"""
    ) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-3600, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), count(lit(1)).over(w).as("n_trailing_hour"))
        .orderBy("event_id")
    },

    // ntile/percent_rank/cume_dist partition by o_custkey for the same
    // scale reason as q_window_rank (never a scale-fixed 3-value key).
    Q(
      "q_window_ntile",
      """SELECT o_orderkey,
        |       CAST(NTILE(4) OVER w AS INT) AS quartile,
        |       PERCENT_RANK() OVER w AS pct_rank,
        |       CUME_DIST() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey"""
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    },

    // Two-phase GLOBAL ranking — the scale answer to "rank the whole
    // table": a single unpartitioned window would pull every row through
    // one task, so instead (1) bucket rows by a range of the sort key
    // (balanced, scales with data), (2) row_number within each bucket,
    // (3) a tiny per-bucket count aggregate (≤ ~100 rows at any scale)
    // yields cumulative offsets via a window over that small set,
    // (4) broadcast the offsets back and add. Total order is
    // (o_totalprice DESC, o_orderkey); the oracle states the semantics
    // directly with one global ROW_NUMBER.
    Q(
      "q_rank_global",
      """SELECT o_orderkey, o_totalprice,
        |       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
        |            AS BIGINT) AS global_rank
        |FROM orders
        |ORDER BY o_orderkey"""
    ) { (s, d) =>
      val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      // fixed-width value buckets on the known price domain; higher
      // bucket = higher price = earlier global rank
      val bucketed = o.withColumn(
        "bkt", floor(col("o_totalprice") / lit(10000.0)).cast("int"))
      val wIn = Window.partitionBy("bkt")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val ranked = bucketed.withColumn("rn_in", row_number().over(wIn))
      val wOff = Window.orderBy(col("bkt").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bucketed
        .groupBy("bkt").agg(count(lit(1)).as("n"))
        .withColumn("off", coalesce(sum("n").over(wOff), lit(0L)))
        .select("bkt", "off")
      ranked
        .join(broadcast(offsets), "bkt")
        .select(
          col("o_orderkey"), col("o_totalprice"),
          (col("off") + col("rn_in")).cast("long").as("global_rank"))
        .orderBy("o_orderkey")
    },

    // ------------------------------------------------------------------
    // sort / limit / top-k
    // ------------------------------------------------------------------
    Q(
      "q_sort_limit",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100"""
    ) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ------------------------------------------------------------------
    // set operations
    // ------------------------------------------------------------------
    Q(
      "q_set_union_all",
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk"""
    ) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .unionByName(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    Q(
      "q_set_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nk"""
    ) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    Q(
      "q_set_except",
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nk"""
    ) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    Q(
      "q_set_except_all",
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey FROM supplier)
        |ORDER BY nk"""
    ) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .exceptAll(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    Q(
      "q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem ORDER BY l_returnflag, l_linestatus"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }
  )
}
