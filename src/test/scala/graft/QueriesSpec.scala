package graft

import org.apache.spark.sql.functions._

/** Engine-level checks that the DuckDB oracle cannot express: sketch
  * accuracy, registry hygiene, plan-shape assertions (pushdown/broadcast —
  * the 100 TB posture SURVEY.md §2C requires).
  */
class QueriesSpec extends SparkSpec {

  test("registry: every oracle key has a query; names are unique") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(SparkEntry.all.map(_.name).distinct.size == SparkEntry.all.size)
    assert(qs.size >= 60)
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct within tolerance of exact (HLL++ accuracy)") {
    // The query itself now carries the exact counts plus the in-tolerance
    // flag (oracle-checked); here we assert the flag AND re-derive the raw
    // estimate accuracy independently.
    val rows = SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
      .orderBy("l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("hll_within_10pct"), r.toString))
    val li = Tables.lineitem(spark, sfDir)
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
      .orderBy("l_returnflag").collect()
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .orderBy("l_returnflag").collect()
    approx.zip(exact).foreach { case (a, e) =>
      val (av, ev) = (a.getAs[Long]("a").toDouble, e.getAs[Long]("n").toDouble)
      // rsd 0.02, 5-sigma bound
      assert(math.abs(av - ev) / ev < 0.10, s"approx $av vs exact $ev")
    }
  }

  test("approx_percentile: in-band flags hold AND raw sketch is accurate") {
    // The query carries exact medians + rank-band booleans (oracle-pinned
    // true); here we assert the flags and independently re-derive the raw
    // sketch's accuracy against the exact percentile.
    val rows = SparkEntry.queries("q_agg_approx_percentile")(spark, sfDir)
      .orderBy("l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("median_in_band"), r.toString)
      assert(r.getAs[Boolean]("q25_in_band"), r.toString)
      assert(r.getAs[Boolean]("q75_in_band"), r.toString)
    }
    val both = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("m"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a"))
      .collect()
    both.foreach { r =>
      val (av, ev) = (r.getAs[Double]("a"), r.getAs[Double]("m"))
      assert(math.abs(av - ev) / ev < 0.02, s"approx $av vs exact $ev")
    }
  }

  test("seeded sample: deterministic across runs, fraction within CI") {
    // within_ci / deterministic are computed inside the query (and
    // oracle-pinned true); assert them, plus plan-level re-execution
    // stability across two full collects.
    val q = SparkEntry.queries("q_sample")
    val r1 = q(spark, sfDir).collect()
    val r2 = q(spark, sfDir).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    assert(r1.nonEmpty)
    r1.foreach { r =>
      assert(r.getAs[Boolean]("within_ci"), r.toString)
      assert(r.getAs[Boolean]("deterministic"), r.toString)
    }
  }

  test("filter + projection push into the parquet scan") {
    val plan = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double"),
      s"column pruning failed in:\n$plan")
  }

  test("ORC scan gets pushed filters and pruned columns (north-star row)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_spec").toFile.getAbsolutePath
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").orc(dir)
    val plan = spark.read.orc(dir)
      .filter(col("l_quantity") > 30)
      .select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"ORC pushdown missing:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"ORC pruning missing:\n$plan")
  }

  test("partitioned parquet read prunes to one partition directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pp_spec").toFile.getAbsolutePath
    Tables.events(spark, sfDir)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter in:\n$scan")
    // pruned scan reads only the matching partition's files
    val files = df.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("event_type=purchase")), files.mkString(","))
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp_spec").toFile.getAbsolutePath
    Tables.events(spark, sfDir)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    import spark.implicits._
    val dim = Seq(("purchase", "convert"), ("signup", "acquire")).toDF("event_type", "category")
      .filter(col("category") === "convert")
    val joined = spark.read.parquet(dir).join(dim, "event_type")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no DPP/partition filter in:\n$plan")
    assert(joined.count() > 0)
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val plan = SparkEntry.queries("q_join_broadcast")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("top-k per group plans a single window, no global sort before filter") {
    val df = SparkEntry.queries("q_window_topk")(spark, sfDir)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"expected window exec in:\n$plan")
  }

  test("similarity top-k keeps corpus side unshuffled (broadcast query set)") {
    val plan = SparkEntry.queries("q_similarity_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast in:\n$plan")
  }

  test("quality tradeoff curve: consistent with the decile table, monotone, complete") {
    val dec = SparkEntry.queries("q_quality_deciles")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q_quality_tradeoff")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == (1L to 10L), "one row per decile cutoff")
    // per-decile doc counts must agree with the separately-verified decile query
    rows.foreach { case (d, nDocs, _, _, _) => assert(nDocs == dec(d), s"decile $d") }
    // cutoff at decile 1 keeps everything; kept totals strictly decrease
    assert(rows.head._3 == dec.values.sum)
    assert(rows.head._5 == 1.0)
    rows.sliding(2).foreach { case Array((_, _, dk1, tk1, f1), (_, _, dk2, tk2, f2)) =>
      assert(dk2 < dk1 && tk2 < tk1 && f2 < f1, "kept totals must decrease")
    }
  }

  test("knnLabel: literal and broadcast-join paths agree on the same input") {
    // the operator self-selects its physical shape by seed size; both
    // shapes must state the SAME semantics (ordering ties included)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val lit = key(ops.SimilarityOps.knnLabel(emb, forceLiteral = Some(true)).collect())
    val join = key(ops.SimilarityOps.knnLabel(emb, forceLiteral = Some(false)).collect())
    assert(lit == join)
    assert(lit.nonEmpty)
  }

  test("knnLabel fails loudly when the seed predicate matches past the cap") {
    // the seed collect is bounded model state — a mis-specified predicate
    // must fail at construction, not OOM the driver (the
    // domainQualityFilter measure-then-decide discipline)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      ops.SimilarityOps.knnLabel(emb, maxSeedRows = 3)
    }
    assert(ex.getMessage.contains("bounded model state"))
    // and the cap is enforced with at most cap+1 rows ever collected:
    // the default cap still builds the frame on the real fixture
    assert(ops.SimilarityOps.knnLabel(emb).columns.nonEmpty)
  }

  test("no query collects to the driver mid-plan (scan of the API surface)") {
    // structural: all registered queries return lazy DataFrames — running
    // .queryExecution.analyzed must not trigger a job.
    SparkEntry.all.take(10).foreach { q =>
      val df = q.fn(spark, sfDir)
      assert(df.queryExecution.analyzed != null)
    }
  }
}
