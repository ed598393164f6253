package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Second pass over the scalar/window surface: the remaining commonly-used
  * string and date functions, nth_value frames, and unionByName with
  * missing columns.
  */
object SecondPassOps extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "q_str_funcs2",
      """SELECT p_partkey,
        |       split_part(p_type, ' ', 1) AS type_word1,
        |       split_part(p_type, ' ', 9) AS type_word9,
        |       starts_with(p_name, 'a') AS starts_a,
        |       ends_with(p_name, 'e') AS ends_e,
        |       contains(p_name, 'al') AS has_al,
        |       translate(p_brand, '#B', '_b') AS brand_translated,
        |       repeat('=', CAST(p_size % 5 + 1 AS INT)) AS size_bar,
        |       CAST(ascii(substring(p_name, 1, 1)) AS INT) AS first_char_code,
        |       left(p_type, 3) AS type_l3,
        |       right(p_type, 3) AS type_r3
        |FROM part ORDER BY p_partkey"""
    ) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        expr("split_part(p_type, ' ', 1)").as("type_word1"),
        expr("split_part(p_type, ' ', 9)").as("type_word9"),
        col("p_name").startsWith("a").as("starts_a"),
        col("p_name").endsWith("e").as("ends_e"),
        col("p_name").contains("al").as("has_al"),
        translate(col("p_brand"), "#B", "_b").as("brand_translated"),
        expr("repeat('=', CAST(p_size % 5 + 1 AS INT))").as("size_bar"),
        ascii(substring(col("p_name"), 1, 1)).as("first_char_code"),
        expr("left(p_type, 3)").as("type_l3"),
        expr("right(p_type, 3)").as("type_r3"))
        .orderBy("p_partkey")
    },

    Q(
      "q_date_funcs2",
      // DuckDB DATE + INTERVAL yields TIMESTAMP -> cast back; both engines
      // clamp end-of-month on add-month (1-31 + 1mo -> 2-29).
      """SELECT o_orderkey,
        |       CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |       CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |       CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
        |       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
        |       make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_first,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
        |FROM orders ORDER BY o_orderkey"""
    ) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        dayofyear(col("o_orderdate")).as("doy"),
        add_months(to_date(col("o_orderdate")), 1).as("next_month"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week_start"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .as("month_first"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("formatted"))
        .orderBy("o_orderkey")
    },

    Q(
      "q_events_time_parts",
      """SELECT event_id,
        |       CAST(hour(ts) AS INT) AS h,
        |       CAST(minute(ts) AS INT) AS m,
        |       CAST(second(ts) AS INT) AS sec
        |FROM events ORDER BY event_id"""
    ) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        hour(col("ts")).as("h"),
        minute(col("ts")).as("m"),
        second(col("ts")).as("sec"))
        .orderBy("event_id")
    },

    Q(
      "q_window_nth",
      """SELECT o_custkey, o_orderkey,
        |       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey"""
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Unpivot/melt: wide measures -> long (measure, value) rows. Oracle
    // states the same reshape as a UNION ALL.
    Q(
      "q_unpivot",
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure, value"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .withColumnRenamed("l_quantity", "quantity")
        .withColumnRenamed("l_discount", "discount")
        .withColumnRenamed("l_tax", "tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("discount"), col("tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure", "value")
    },

    Q(
      "q_set_intersect_all",
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey FROM supplier)
        |ORDER BY nk"""
    ) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersectAll(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    // Fuzzy (edit-distance) self-join: near-matching part names within a
    // bounded candidate block — the dirty-data record-linkage primitive.
    // Blocking on the first character keeps candidates subquadratic (the
    // production recipe; here it also exercises a computed join key).
    Q(
      "q_fuzzy_join",
      """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        |  ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
        | AND a.p_partkey < b.p_partkey
        |WHERE a.p_partkey < 100 AND b.p_partkey < 100
        |  AND levenshtein(a.p_name, b.p_name) <= 5
        |ORDER BY k1, k2"""
    ) { (s, d) =>
      val p = Tables.part(s, d).filter(col("p_partkey") < 100)
      val a = p.select(col("p_partkey").as("k1"), col("p_name").as("n1"),
        substring(col("p_name"), 1, 1).as("blk1"))
      val b = p.select(col("p_partkey").as("k2"), col("p_name").as("n2"),
        substring(col("p_name"), 1, 1).as("blk2"))
      a.join(b, col("blk1") === col("blk2") && col("k1") < col("k2"))
        .filter(levenshtein(col("n1"), col("n2")) <= 5)
        .select(col("k1"), col("k2"), levenshtein(col("n1"), col("n2")).as("dist"))
        .orderBy("k1", "k2")
    },

    // Seeded Bernoulli sampling: RNG streams differ per engine, so the
    // sampled counts themselves can't hash-match DuckDB. Tolerance-boolean
    // oracle instead (the q_agg_approx_distinct pattern): emit the EXACT
    // per-group total (oracle-checkable) plus two pinned-true booleans —
    // `within_ci` (sampled count inside a 5-sigma binomial band around
    // 0.1·n, p < 3e-7 of a false failure) and `deterministic` (two
    // evaluations of the same seeded sample agree — the retry/audit
    // property a 100 TB sampled pipeline needs).
    Q(
      "q_sample",
      """SELECT l_returnflag,
        |       COUNT(*) AS n_total,
        |       true AS within_ci,
        |       true AS deterministic
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
    ) { (s, d) =>
      def sampled(tag: String) = Tables.lineitem(s, d)
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as(s"n_$tag"))
      val totals = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_total"))
      val sigma = sqrt(col("n_total") * 0.1 * 0.9)
      totals
        .join(sampled("a"), "l_returnflag")
        .join(sampled("b"), "l_returnflag")
        .select(
          col("l_returnflag"),
          col("n_total"),
          (abs(col("n_a") - col("n_total") * 0.1) <= sigma * 5.0).as("within_ci"),
          (col("n_a") === col("n_b")).as("deterministic"))
        .orderBy("l_returnflag")
    },

    // Deterministic hash-Bernoulli sampling (the engine-portable sibling
    // of q_sample): keep a row iff the first two hex chars of
    // md5(orderkey) sort below '08' (~3.1% rate). Unlike a seeded RNG
    // stream this is reproducible across engines, partitionings, AND
    // retries — the property that makes sampled pipelines auditable at
    // 100 TB — so it gets a full value oracle.
    Q(
      "q_sample_hash",
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_sampled,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS sampled_value
        |FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '08'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    ) { (s, d) =>
      Tables.orders(s, d)
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) < "08")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_sampled"),
          Exact.dsum(col("o_totalprice")).as("sampled_value"))
        .orderBy("o_orderpriority")
    },

    // unionByName(allowMissingColumns): schema evolution across sources.
    Q(
      "q_union_missing_cols",
      """SELECT name, rk FROM (
        |  SELECT n_name AS name, n_regionkey AS rk FROM nation
        |  UNION ALL
        |  SELECT r_name AS name, NULL AS rk FROM region)
        |ORDER BY name, rk NULLS FIRST"""
    ) { (s, d) =>
      val a = Tables.nation(s, d)
        .select(col("n_name").as("name"), col("n_regionkey").as("rk"))
      val b = Tables.region(s, d).select(col("r_name").as("name"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("name"), col("rk").asc_nulls_first)
    }
  )
}
