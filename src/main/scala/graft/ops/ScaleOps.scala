package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, QueryModule, Tables}

/** Scale-posture operators (SURVEY.md §2C "100 TB" row, §7.4): the salting
  * recipe for skewed keys, and the remaining source formats (CSV, JSON)
  * with explicit schemas — schema-on-read is never inferred (§1.1: the
  * reference's schema is compile-time-fixed).
  */
object ScaleOps extends QueryModule {

  def queries: Seq[Q] = Seq(
    // Skew salting recipe, oracle-proven: l_returnflag has 3 values, so a
    // plain groupBy funnels 600k rows into 3 reducers. Salt the key with a
    // deterministic shard (l_orderkey % 8), pre-aggregate (key, salt) —
    // map-side partials now spread over 24 groups — then finish on key.
    // The oracle is the UNSALTED aggregation: equal results prove the
    // rewrite is semantics-preserving.
    Q(
      "q_skew_salted",
      """SELECT l_returnflag,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
    ) { (s, d) =>
      val salted = Tables.lineitem(s, d)
        .withColumn("salt", (col("l_orderkey") % 8).cast("int"))
        .groupBy("l_returnflag", "salt")
        .agg(
          count(lit(1)).as("pn"),
          sum(col("l_quantity").cast(DecimalType(38, 10))).as("psum"))
      salted
        .groupBy("l_returnflag")
        .agg(
          sum(col("pn")).as("n"),
          sum(col("psum")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // Z-order (Morton) interleave key — the data-layout recipe for
    // multi-dimensional pruning at 100 TB: sorting a table by z before a
    // partitioned write keeps parquet row-group min/max stats tight on
    // BOTH dimensions at once, so scans filtered on either column skip
    // most files (plain sort only prunes its leading column). Pure
    // integer bit-math, bit-for-bit identical in both engines; the
    // 8-bit-per-dimension interleave is unrolled so every term is a
    // compile-time-constant shift (codegen-friendly, no lambda loop).
    Q(
      "q_zorder_key",
      {
        val terms = (0 until 8).map { i =>
          s"((((l_partkey & 255) >> $i) & 1) << ${2 * i}) | " +
            s"((((l_suppkey & 255) >> $i) & 1) << ${2 * i + 1})"
        }.mkString(" | ")
        s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           |       CAST($terms AS BIGINT) AS z
           |FROM lineitem WHERE l_orderkey < 100
           |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""
      }
    ) { (s, d) =>
      val px = col("l_partkey").bitwiseAND(lit(255L))
      val sx = col("l_suppkey").bitwiseAND(lit(255L))
      val z = (0 until 8).map { i =>
        shiftleft(shiftright(px, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(sx, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }.reduce(_ bitwiseOR _)
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), z.cast("long").as("z"))
        // total order over the OUTPUT columns (z is determined by
        // partkey+suppkey): (orderkey, linenumber) alone has duplicates
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    },

    // CSV sink + source with an explicit schema (no inferSchema pass).
    Q(
      "q_csv_roundtrip",
      """SELECT n_regionkey, COUNT(*) AS n_nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_csv").toFile.getAbsolutePath
      Tables.nation(s, d).write.mode("overwrite").option("header", "true").csv(dir)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.schema(schema).option("header", "true").csv(dir)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n_nations"))
        .orderBy("n_regionkey")
    },

    // Plain-text sink + source: one line per record (the raw-corpus
    // interchange format every crawl pipeline starts from). The write
    // emits the text column alone; the read recovers it as `value` and
    // re-derives the analysis columns — proving text-file round-tripping
    // loses nothing the pipeline needs. Aggregated output keeps the
    // oracle row-count stable across SFs. Line-oriented text can only
    // round-trip single-line, non-null records — write.text throws on
    // nulls and a '\n' would split on read-back — so BOTH sides filter
    // to that domain explicitly instead of relying on the fixture
    // corpus happening to satisfy it.
    Q(
      "q_text_roundtrip",
      s"""SELECT COUNT(*) AS n_docs,
         |       CAST(SUM(len(text)) AS BIGINT) AS total_chars,
         |       COUNT(DISTINCT md5(text)) AS n_distinct,
         |       MIN(md5(text)) AS min_hash
         |FROM documents
         |WHERE text IS NOT NULL
         |  AND NOT contains(text, chr(10)) AND NOT contains(text, chr(13))"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_text").toFile.getAbsolutePath
      Tables.documents(s, d).select("text")
        .filter(col("text").isNotNull &&
          !col("text").contains("\n") && !col("text").contains("\r"))
        .write.mode("overwrite").text(dir)
      s.read.text(dir)
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("value"))).cast("long").as("total_chars"),
          countDistinct(md5(col("value").cast("binary"))).as("n_distinct"),
          min(md5(col("value").cast("binary"))).as("min_hash"))
    },

    // XML sink + source (built into Spark 4): nested rowTag documents,
    // explicit schema on read — the "ingest partner feeds" path of a
    // production lake.
    Q(
      "q_xml_roundtrip",
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_xml").toFile.getAbsolutePath
      Tables.region(s, d).write.mode("overwrite")
        .option("rowTag", "region").format("xml").save(dir)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType)))
      s.read.schema(schema).option("rowTag", "region").format("xml").load(dir)
        .orderBy("r_regionkey")
    },

    // JSON-lines sink + source, explicit schema.
    Q(
      "q_json_roundtrip",
      """SELECT c_mktsegment,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_json").toFile.getAbsolutePath
      Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite").json(dir)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_mktsegment", StringType),
        StructField("c_acctbal", DoubleType)))
      s.read.schema(schema).json(dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("c_acctbal")).as("total_bal"))
        .orderBy("c_mktsegment")
    },

    // Partitioned layout + static partition pruning: write events
    // hive-partitioned by event_type, read back one partition — the scan
    // must touch a single directory (PartitionFilters, asserted in
    // QueriesSpec). At 100 TB this is the difference between scanning a
    // shard and scanning the lake.
    Q(
      "q_partition_pruning",
      """SELECT CAST(ts AS DATE) AS day,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY day"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
      graft.Tables.events(s, d)
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      s.read.parquet(dir)
        .filter(col("event_type") === "purchase") // pruned to one directory
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("total_value"))
        .orderBy("day")
    },

    // Explicit repartition + sortWithinPartitions (the physical layout
    // primitives every 100 TB pipeline leans on) — semantics-neutral, so
    // the oracle is the plain projection.
    Q(
      "q_repartition_sort",
      """SELECT s_suppkey, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey"""
    ) { (s, d) =>
      Tables.supplier(s, d)
        .repartition(4, col("s_nationkey"))
        .sortWithinPartitions("s_suppkey")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    }
  )
}
