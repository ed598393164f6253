package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Second-pass §2B surface: pivot, generator/UDTF (posexplode), first/last
  * window frames, exact percentiles, IVF-style ANN, and bucketed-table
  * co-located joins.
  */
object ExtraOps extends QueryModule {

  def queries: Seq[Q] = Seq(
    // Pivot == conditional aggregation; the oracle states it that way.
    Q(
      "q_pivot",
      """SELECT o_orderpriority,
        |       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    ) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    },

    // Generator/UDTF row: posexplode over tokenized documents.
    Q(
      "q_posexplode",
      s"""WITH w AS (SELECT doc_id, ${TextOps.WordsSql} AS ws FROM documents WHERE doc_id < 20),
         |idx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w)
         |SELECT doc_id, CAST(i - 1 AS INT) AS pos, ws[i] AS word
         |FROM idx ORDER BY doc_id, pos"""
    ) { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(TextOps.words(col("text"))).as(Seq("pos", "word")))
        .orderBy("doc_id", "pos")
    },

    // first/last over full frames (the §2B window list's remaining pair).
    Q(
      "q_window_firstlast",
      """SELECT o_custkey, o_orderkey,
        |       FIRST_VALUE(o_totalprice) OVER w AS first_price,
        |       LAST_VALUE(o_totalprice)  OVER w AS last_price,
        |       MIN(o_totalprice) OVER w AS min_price,
        |       MAX(o_totalprice) OVER w AS max_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey"""
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"),
          min(col("o_totalprice")).over(w).as("min_price"),
          max(col("o_totalprice")).over(w).as("max_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Exact percentiles (sort-based). Interpolation arithmetic may differ
    // in the last ulp between engines -> round(6).
    Q(
      "q_percentiles",
      """SELECT l_returnflag,
        |       floor(quantile_cont(l_quantity, 0.5) * 1e6 + 0.5) / 1e6 AS median_qty,
        |       floor(quantile_cont(l_quantity, 0.9) * 1e6 + 0.5) / 1e6 AS p90_qty,
        |       floor(quantile_cont(l_extendedprice, 0.99) * 1e6 + 0.5) / 1e6 AS p99_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          Exact.round6(expr("percentile(l_quantity, 0.5)")).as("median_qty"),
          Exact.round6(expr("percentile(l_quantity, 0.9)")).as("p90_qty"),
          Exact.round6(expr("percentile(l_extendedprice, 0.99)")).as("p99_price"))
        .orderBy("l_returnflag")
    },

    // Sketch percentile (approx_percentile): DuckDB's approx_quantile is a
    // different sketch, so raw sketch values can't hash-match. Same
    // tolerance-boolean pattern as q_agg_approx_distinct: emit the EXACT
    // median (oracle-checkable, round-6 per libm parity rules) plus
    // booleans asserting each sketch value landed inside a ±2%-rank band
    // around its exact quantile (accuracy 1000 ⇒ rank error ≤ 0.1%, so
    // the 2% band is a 20× margin). The oracle pins the booleans to true
    // — an out-of-tolerance sketch hash-mismatches the driver gate.
    Q(
      "q_agg_approx_percentile",
      """SELECT l_returnflag,
        |       floor(quantile_cont(l_extendedprice, 0.5) * 1e6 + 0.5) / 1e6 AS exact_median,
        |       true AS median_in_band,
        |       true AS q25_in_band,
        |       true AS q75_in_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
    ) { (s, d) =>
      def pct(p: Double) = expr(s"percentile(l_extendedprice, $p)")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          pct(0.5).as("exact_median"),
          pct(0.48).as("lo50"), pct(0.52).as("hi50"),
          pct(0.23).as("lo25"), pct(0.27).as("hi25"),
          pct(0.73).as("lo75"), pct(0.77).as("hi75"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"),
          expr("approx_percentile(l_extendedprice, array(0.25, 0.75), 1000)").as("aq"))
        .select(
          col("l_returnflag"),
          Exact.round6(col("exact_median")).as("exact_median"),
          col("approx_median").between(col("lo50"), col("hi50")).as("median_in_band"),
          element_at(col("aq"), 1).between(col("lo25"), col("hi25")).as("q25_in_band"),
          element_at(col("aq"), 2).between(col("lo75"), col("hi75")).as("q75_in_band"))
        .orderBy("l_returnflag")
    },

    // IVF-style ANN: fixed 16-vector codebook (vec_id 100..115), assign
    // every vector to its nearest centroid by L2 (exact double folds),
    // then search only the query's cell. The coarse-quantizer structure of
    // a real IVF index, in two shuffles.
    Q(
      "q_ann_ivf",
      """WITH cent AS (
        |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
        |  WHERE vec_id BETWEEN 100 AND 115),
        |dists AS (
        |  SELECT e.vec_id, c.cid,
        |         list_reduce(list_transform(generate_series(1, len(e.embedding)),
        |           i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE)) *
        |                (CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE))),
        |           (x, y) -> x + y) AS dist
        |  FROM embeddings e CROSS JOIN cent c),
        |assign AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM dists) WHERE rn = 1),
        |q AS (
        |  SELECT a.vec_id AS qid, e.embedding AS qe, a.cell
        |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
        |  WHERE a.vec_id < 10),
        |cand AS (
        |  SELECT a.vec_id AS vid, e.embedding AS ve, a.cell
        |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
        |scored AS (
        |  SELECT qid, vid,
        |         list_reduce(list_transform(generate_series(1, len(qe)),
        |           i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE)), (x, y) -> x + y) /
        |         (sqrt(list_reduce(list_transform(qe, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) *
        |          sqrt(list_reduce(list_transform(ve, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))) AS sim
        |  FROM q JOIN cand ON cand.cell = q.cell AND vid <> qid)
        |SELECT qid, vid, sim, CAST(rn AS INT) AS rn FROM (
        |  SELECT qid, vid, sim,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
        |  FROM scored)
        |WHERE rn <= 3 ORDER BY qid, rn"""
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // The 16-vector codebook is bounded model state (the knnLabel /
      // kmeans EAGER-collect discipline): collect it once and bake the
      // literal centroids into ONE narrow codegen NearestCentroid pass —
      // the previous crossJoin(broadcast) spelling evaluated an
      // interpreted zip_with/aggregate fold PER (vector, centroid) pair
      // (16 CodegenFallback folds per row) and then re-aggregated the
      // 16x-exploded frame by vec_id. Same argmin: NearestCentroid's
      // strict-improvement loop over ascending ids picks the smallest
      // (dist, cid) — exactly the min_by(struct(dist, cid)) row the
      // oracle's ROW_NUMBER()=1 states; the distance is the identical
      // ascending-index Σ(x−c)² left fold in double.
      val cents = emb.filter(col("vec_id").between(100, 115))
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toIndexedSeq))
        .sortBy(_._1).toSeq
      val withEmb = emb
        .withColumn("m", graft.functions.GraftFunctions.nearest_centroid(
          col("embedding"), cents.map(_._1), cents.map(_._2)))
        .select(col("vec_id"), col("embedding"), col("m.k").as("cell"))
      val q = withEmb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell").as("qcell"))
      val cand = withEmb
        .select(col("vec_id").as("vid"), col("embedding").as("ve"), col("cell"))
      val scored = cand.join(broadcast(q),
        col("cell") === col("qcell") && col("vid") =!= col("qid"))
        .select(col("qid"), col("vid"),
          graft.functions.GraftFunctions.cosine_sim(col("qe"), col("ve")).as("sim"))
      SimilarityOps.topkPerQuery(scored, 3)
    },

    // Bucketed tables: both join sides pre-bucketed on the join key so the
    // join needs no exchange (asserted in BucketedJoinSpec) — Spark's
    // co-located-join answer to "reuse a partitioning across stages".
    Q(
      "q_bucketed_join",
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    ) { (s, d) =>
      val base = Files.createTempDirectory("graft_bucket").toFile.getAbsolutePath
      s.sql("DROP TABLE IF EXISTS graft_orders_bkt")
      s.sql("DROP TABLE IF EXISTS graft_customer_bkt")
      Tables.orders(s, d).select("o_custkey", "o_totalprice").write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders").saveAsTable("graft_orders_bkt")
      Tables.customer(s, d).select("c_custkey", "c_mktsegment").write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer").saveAsTable("graft_customer_bkt")
      s.table("graft_orders_bkt")
        .join(s.table("graft_customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), Exact.dsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")
    }
  )
}
