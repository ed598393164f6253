package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Scalar function surface (SURVEY.md §2B rows: string / date / math /
  * array / JSON / conditional). Everything here is a Catalyst built-in from
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs — so the whole
  * projection stays inside one WholeStageCodegen span over the scan.
  *
  * Cross-engine cast discipline: DuckDB returns BIGINT where Spark returns
  * INT (length, levenshtein, instr, year, ...) — every oracle casts to the
  * Spark type so the driver's schema check passes.
  */
object ScalarOps extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "q_str_funcs",
      """SELECT p_partkey,
        |       lower(p_name) AS name_lower,
        |       upper(p_brand) AS brand_upper,
        |       CAST(length(p_name) AS INT) AS name_len,
        |       substring(p_type, 1, 5) AS type_prefix,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
        |       p_name LIKE '%al%' AS has_al,
        |       CAST(levenshtein(p_brand, 'Brand#11') AS INT) AS lev_to_b11,
        |       CAST(instr(p_type, 'ED') AS INT) AS ed_pos,
        |       trim(concat('  ', p_brand, ' ')) AS trimmed,
        |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |       reverse(p_brand) AS brand_rev
        |FROM part ORDER BY p_partkey"""
    ) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devowel"),
        col("p_name").like("%al%").as("has_al"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("lev_to_b11"),
        instr(col("p_type"), "ED").as("ed_pos"),
        trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        reverse(col("p_brand")).as("brand_rev"))
        .orderBy("p_partkey")
    },

    Q(
      "q_date_funcs",
      // DuckDB: year()/month()/day() return BIGINT, dayofweek() is
      // 0=Sunday (Spark: 1=Sunday); date arithmetic casts spelled out.
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date,
        |       CAST(year(o_orderdate) AS INT) AS y,
        |       CAST(month(o_orderdate) AS INT) AS m,
        |       CAST(day(o_orderdate) AS INT) AS dom,
        |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |       CAST(quarter(o_orderdate) AS INT) AS q,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |       CAST(o_orderdate AS DATE) + 30 AS due_date,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec
        |FROM orders ORDER BY o_orderkey"""
    ) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .as("days_since_epoch_start"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_sec"))
        .orderBy("o_orderkey")
    },

    Q(
      "q_math_funcs",
      // pow/ln/log10 go through libm and can differ in the last ulp across
      // runtimes -> round(6). sqrt/abs/floor/ceil/sign are IEEE-exact.
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       abs(0.5 - l_discount) AS abs_off_half,
        |       floor(l_extendedprice / 1000) AS price_k_floor,
        |       ceil(l_extendedprice / 1000) AS price_k_ceil,
        |       sqrt(l_quantity) AS qty_sqrt,
        |       floor(pow(l_quantity, 1.5) * 1e6 + 0.5) / 1e6 AS qty_pow,
        |       floor(ln(l_extendedprice) * 1e6 + 0.5) / 1e6 AS price_ln,
        |       floor(log10(l_extendedprice) * 1e6 + 0.5) / 1e6 AS price_log10,
        |       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
        |       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
        |       greatest(l_quantity, 25.0) AS qty_hi,
        |       least(l_quantity, 25.0) AS qty_lo
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""
    ) { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        abs(lit(0.5) - col("l_discount")).as("abs_off_half"),
        floor(col("l_extendedprice") / 1000).cast("double").as("price_k_floor"),
        ceil(col("l_extendedprice") / 1000).cast("double").as("price_k_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        Exact.round6(pow(col("l_quantity"), 1.5)).as("qty_pow"),
        Exact.round6(log(col("l_extendedprice"))).as("price_ln"),
        Exact.round6(log10(col("l_extendedprice"))).as("price_log10"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        (col("l_orderkey") % 7).as("key_mod7"),
        greatest(col("l_quantity"), lit(25.0)).as("qty_hi"),
        least(col("l_quantity"), lit(25.0)).as("qty_lo"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    Q(
      "q_array_funcs",
      // DuckDB list slicing a[1:4] is 1-based inclusive == Spark
      // slice(a,1,4). Left-fold parity: Spark aggregate(0.0, +) and DuckDB
      // list_reduce both fold left; 0.0 + x == x exactly in IEEE.
      // Array-typed intermediates (slice/transform/sort) are probed via
      // scalar element picks: the driver's comparator sorts the result in
      // pandas, and list columns are unhashable there.
      """SELECT vec_id,
        |       CAST(len(embedding) AS INT) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS first_val,
        |       CAST(embedding[64] AS DOUBLE) AS last_val,
        |       CAST((embedding[1:4])[2] AS DOUBLE) AS head4_2,
        |       CAST(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE) * 2)[3] AS DOUBLE) AS head4_doubled_3,
        |       CAST(list_sort(embedding[1:4])[1] AS DOUBLE) AS head4_sorted_min,
        |       CAST(list_max(embedding) AS DOUBLE) AS emb_max,
        |       CAST(list_min(embedding) AS DOUBLE) AS emb_min,
        |       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS norm_sq,
        |       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
        |FROM embeddings ORDER BY vec_id"""
    ) { (s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        element_at(col("embedding"), 64).cast("double").as("last_val"),
        element_at(slice(col("embedding"), 1, 4), 2).cast("double").as("head4_2"),
        element_at(transform(slice(col("embedding"), 1, 4), x => x.cast("double") * 2), 3)
          .cast("double").as("head4_doubled_3"),
        element_at(sort_array(slice(col("embedding"), 1, 4)), 1)
          .cast("double").as("head4_sorted_min"),
        array_max(col("embedding")).cast("double").as("emb_max"),
        array_min(col("embedding")).cast("double").as("emb_min"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("norm_sq"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"))
        .orderBy("vec_id")
    },

    Q(
      "q_json_funcs",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |       json_extract_string(props, '$.k') AS k_str,
        |       json_extract(props, '$.k') IS NOT NULL AS has_k,
        |       json_extract(props, '$.missing') IS NOT NULL AS has_missing
        |FROM events ORDER BY event_id"""
    ) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").isNotNull.as("has_k"),
        get_json_object(col("props"), "$.missing").isNotNull.as("has_missing"))
        .orderBy("event_id")
    },

    // Spark map type exercised end-to-end; the oracle states the same
    // semantics without maps (CASE) — the driver compares results, not
    // plans, so this is a legitimate cross-dialect equivalence.
    Q(
      "q_map_funcs",
      // literal 0.1 is DECIMAL in DuckDB -> cast the CASE to DOUBLE
      """SELECT event_id, event_type,
        |       CAST(CASE event_type WHEN 'view' THEN 0.1 WHEN 'click' THEN 0.5
        |            WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 3.0
        |            ELSE -1.0 END AS DOUBLE) AS weight,
        |       CAST(CASE event_type WHEN 'view' THEN 0.1 WHEN 'click' THEN 0.5
        |            WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 3.0
        |            ELSE -1.0 END AS DOUBLE) * value AS weighted_value
        |FROM events ORDER BY event_id"""
    ) { (s, d) =>
      val weights = map(
        lit("view"), lit(0.1), lit("click"), lit(0.5),
        lit("purchase"), lit(5.0), lit("signup"), lit(3.0))
      Tables.events(s, d).select(
        col("event_id"), col("event_type"),
        coalesce(element_at(weights, col("event_type")), lit(-1.0)).as("weight"),
        (coalesce(element_at(weights, col("event_type")), lit(-1.0)) * col("value"))
          .as("weighted_value"))
        .orderBy("event_id")
    },

    Q(
      "q_cond_funcs",
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS size_bucket,
        |       nullif(o_orderstatus, 'P') AS status_or_null,
        |       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
        |       o_orderstatus = 'F' AND o_totalprice > 100000 AS big_final,
        |       o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_orderstatus = 'P' AS hot,
        |       isnan(o_totalprice) AS price_nan,
        |       o_custkey IS NULL AS cust_null
        |FROM orders ORDER BY o_orderkey"""
    ) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "medium")
          .otherwise("large").as("size_bucket"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_resolved"),
        (col("o_orderstatus") === "F" && col("o_totalprice") > 100000).as("big_final"),
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH") || col("o_orderstatus") === "P")
          .as("hot"),
        isnan(col("o_totalprice")).as("price_nan"),
        col("o_custkey").isNull.as("cust_null"))
        .orderBy("o_orderkey")
    },

    // Third string batch: padding/translation/hashing — the remaining
    // scalar-string surface with a DuckDB twin (initcap/overlay have
    // none, so they stay out of the oracle set).
    Q(
      "q_str_funcs3",
      """SELECT p_partkey,
        |       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
        |       translate(p_name, 'aeiou', '01234') AS translated,
        |       reverse(p_name) AS reversed,
        |       repeat(substr(p_name, 1, 2), 3) AS repeated,
        |       split_part(p_name, ' ', 1) AS first_word,
        |       sha256(p_name) AS name_sha256,
        |       CAST(bit_count(p_partkey) AS INT) AS key_bits
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey"""
    ) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          lpad(col("p_partkey").cast("string"), 10, "0").as("padded_key"),
          translate(col("p_name"), "aeiou", "01234").as("translated"),
          reverse(col("p_name")).as("reversed"),
          repeat(substring(col("p_name"), 1, 2), 3).as("repeated"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          sha2(col("p_name"), 256).as("name_sha256"),
          bit_count(col("p_partkey")).cast("int").as("key_bits"))
        .orderBy("p_partkey")
    },

    // Second array batch: sort/distinct/slice/flatten-style ops. Array
    // RESULTS leave as joined strings — the driver's comparator can't
    // sort list cells, and the join also pins element order exactly.
    // DuckDB's list_distinct is unordered, so both engines sort after
    // distinct; DuckDB's 1-based inclusive slice [1:3] == slice(a,1,3).
    Q(
      "q_array_funcs2",
      s"""SELECT doc_id,
         |       array_to_string(list_sort(${TextOps.WordsSql}), ' ') AS sorted_words,
         |       array_to_string(list_sort(list_distinct(${TextOps.WordsSql})), ' ') AS distinct_sorted,
         |       array_to_string((${TextOps.WordsSql})[1:3], ' ') AS first3,
         |       CAST(len(list_distinct(${TextOps.WordsSql})) AS INT) AS n_distinct,
         |       len(${TextOps.WordsSql}) > 0 AS has_words
         |FROM documents WHERE doc_id < 300 ORDER BY doc_id"""
    ) { (s, d) =>
      val ws = TextOps.words(col("text"))
      Tables.documents(s, d)
        .filter(col("doc_id") < 300)
        .select(
          col("doc_id"),
          array_join(array_sort(ws), " ").as("sorted_words"),
          array_join(array_sort(array_distinct(ws)), " ").as("distinct_sorted"),
          array_join(slice(ws, 1, 3), " ").as("first3"),
          size(array_distinct(ws)).as("n_distinct"),
          // size(), not element_at(...,1): ANSI mode (Spark 4 default)
          // throws on element_at of an empty array
          (size(ws) > 0).as("has_words"))
        .orderBy("doc_id")
    }
  )
}
