package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Graph analytics over entity graphs extracted from the fact tables.
  *
  * The 100 TB shape: the expensive stage is the EDGE EXTRACTION — a
  * fact-scale join + aggregation that shrinks the data to an
  * entity-level weighted graph — and every subsequent power-iteration
  * step runs on that aggregated graph (entity-count-sized, usually
  * orders of magnitude smaller). This mirrors how production graph jobs
  * run PageRank over, say, a domain-link graph distilled from a crawl:
  * distill once, iterate cheaply, never iterate over the raw fact data.
  *
  * Determinism: iteration sums use the Exact decimal pattern, so the
  * unrolled-SQL oracle reproduces the same doubles bit-for-bit; the
  * final scores are rounded to 8 decimals on both sides.
  */
object GraphOps extends QueryModule {

  private val N = 25          // nation count (fixed by the schema)
  private val Iters = 3
  private val Damping = 0.85

  /** DuckDB oracle: edge extraction + `Iters` unrolled power iterations,
    * generated from the same loop shape as the Spark side.
    */
  private def pagerankOracle: String = {
    val steps = (1 to Iters).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS node,
         |         CAST(SUM(CAST(p.pr * e.w / o.outw AS DECIMAL(38,10))) AS DOUBLE) AS c
         |  FROM e JOIN o ON e.src = o.src JOIN p${k - 1} p ON p.node = e.src
         |  GROUP BY e.dst),
         |p$k AS (
         |  SELECT p.node,
         |         CAST(0.15 AS DOUBLE) / $N
         |           + CAST($Damping AS DOUBLE) * COALESCE(c.c, CAST(0 AS DOUBLE)) AS pr
         |  FROM p${k - 1} p LEFT JOIN c$k c ON c.node = p.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH cn AS (
       |  SELECT c_custkey, n_name AS src FROM customer
       |  JOIN nation ON c_nationkey = n_nationkey),
       |sn AS (
       |  SELECT s_suppkey, n_name AS dst FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey),
       |e AS (
       |  SELECT cn.src, sn.dst, COUNT(*) AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN cn ON o_custkey = c_custkey
       |  JOIN sn ON l_suppkey = s_suppkey
       |  GROUP BY cn.src, sn.dst),
       |o AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM e GROUP BY src),
       |p0 AS (SELECT n_name AS node, CAST(1.0 AS DOUBLE) / $N AS pr FROM nation),
       |$steps
       |SELECT node, floor(pr * 1e8 + 0.5) / 1e8 AS pr FROM p$Iters ORDER BY node""".stripMargin
  }

  /** Spark side: identical loop, edges aggregated once then iterated. */
  private def pagerankSpark(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("src"))
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("dst"))
    // fact-scale distillation: one pass over lineitem⋈orders, dimensions
    // broadcast, output is the |nations|² weighted edge list
    val edges = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("w"))
      .localCheckpoint() // iterate over the distilled graph, not the lineage
    val out = edges.groupBy("src").agg(sum(col("w")).as("outw"))
    val nodes = Tables.nation(s, d).select(col("n_name").as("node"))
    var pr = nodes.withColumn("pr", lit(1.0) / N)
    (1 to Iters).foreach { _ =>
      val contrib = edges
        .join(out, "src")
        .join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("pr") * col("w") / col("outw")).as("term"))
        .groupBy("node")
        .agg(Exact.dsum(col("term")).as("c"))
      pr = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) / N + lit(Damping) * coalesce(col("c"), lit(0.0))).as("pr"))
    }
    pr.select(col("node"), Exact.roundN(col("pr"), 8).as("pr")).orderBy("node")
  }

  def queries: Seq[Q] = Seq(
    // Weighted PageRank over the customer-nation → supplier-nation trade
    // graph distilled from lineitem⋈orders (damping 0.85, 3 iterations,
    // dangling nodes contribute nothing — the simplified-PageRank
    // convention). Nodes with no inbound weight keep the teleport mass.
    Q("q_pagerank_nations", pagerankOracle)(pagerankSpark _)
  )
}
