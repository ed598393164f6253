package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Distributed ML training primitives over the embeddings table.
  *
  * K-means (Lloyd) is the canonical one: it is the TRAINING step behind
  * the IVF coarse quantizer (`q_ann_ivf` searches a codebook; this query
  * builds one). The 100 TB shape: ASSIGNMENT IS NARROW — the K·dim
  * centroid table rides a broadcast and each vector folds its squared
  * distances in one codegen'd pass, so the corpus-scale data never
  * shuffles to be assigned; the only per-iteration shuffle is the
  * centroid UPDATE (a partial-aggregated (cluster, dim) mean — the
  * reduce step no formulation avoids). Iteration count is a small
  * constant and the corpus frame is localCheckpoint'd once.
  *
  * Determinism: per-vector distances are left folds (IEEE-identical to
  * DuckDB's `list_reduce`, 0.0 + x == x); assignment ties break to the
  * smallest cluster id; centroid means and the final inertia use the
  * Exact decimal-sum pattern; the oracle unrolls the same loop.
  */
object MlOps extends QueryModule {

  private val K = 4
  private val Iters = 2

  /** DuckDB oracle: `Iters` unrolled Lloyd iterations generated from the
    * same loop shape as the Spark side.
    */
  private def kmeansOracle: String = {
    def assignCte(k: Int): String =
      s"""d$k AS (
         |  SELECT e.vec_id, c.k,
         |         list_reduce(list_transform(generate_series(1, len(e.embedding)),
         |           i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])
         |                * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])),
         |           (x, y) -> x + y) AS dist
         |  FROM embeddings e CROSS JOIN c$k c),
         |a$k AS (
         |  SELECT d.vec_id, MIN(d.k) AS cl, m.md AS dist
         |  FROM d$k d
         |  JOIN (SELECT vec_id, MIN(dist) AS md FROM d$k GROUP BY vec_id) m
         |    ON d.vec_id = m.vec_id AND d.dist = m.md
         |  GROUP BY d.vec_id, m.md)""".stripMargin
    val steps = (1 to Iters).map { k =>
      s"""${assignCte(k - 1)},
         |m$k AS (
         |  SELECT a.cl, i AS pos,
         |         CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE)
         |           / COUNT(*) AS c
         |  FROM embeddings e
         |  JOIN a${k - 1} a ON e.vec_id = a.vec_id,
         |  unnest(generate_series(1, len(e.embedding))) AS t(i)
         |  GROUP BY a.cl, i),
         |c$k AS (SELECT cl AS k, list(c ORDER BY pos) AS carr FROM m$k GROUP BY cl)""".stripMargin
    }.mkString(",\n")
    s"""WITH c0 AS (
       |  SELECT vec_id AS k, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS carr
       |  FROM embeddings WHERE vec_id < $K),
       |$steps,
       |${assignCte(Iters)}
       |SELECT cl AS cluster,
       |       COUNT(*) AS n_vecs,
       |       round(CAST(SUM(CAST(dist AS DECIMAL(38,10))) AS DOUBLE), 6) AS inertia
       |FROM a$Iters GROUP BY cl ORDER BY cluster""".stripMargin
  }

  /** Spark side: identical loop. Returns (cluster, n_vecs, inertia). */
  def kmeans(emb: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    // materialize the corpus once; every assignment/update pass reads it
    // back instead of re-scanning
    val vecs = emb.select(col("vec_id"), col("embedding")).localCheckpoint()
    // deterministic init: the first k vectors are the seed centroids
    var cent = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("k"),
        transform(col("embedding"), v => v.cast("double")).as("carr"))

    // FULLY NARROW assignment: the K centroids collapse to a ONE-ROW
    // broadcast array of (carr, k) structs, and each vector computes its
    // argmin as a per-row expression — fold the squared distance per
    // centroid, array_min over (dist, k) structs (smallest distance,
    // ties to the smallest cluster id — the same pair the oracle's
    // min-join selects). The corpus-scale rows — embedding payload
    // included — never enter ANY exchange: the n×K candidate rows a
    // join-based assignment would shuffle and re-collapse never exist.
    def assigned(c: DataFrame): DataFrame = {
      val centRow = c.agg(collect_list(struct(col("carr"), col("k"))).as("cents"))
      vecs
        .crossJoin(broadcast(centRow))
        .withColumn("m", array_min(transform(col("cents"), ct => struct(
          aggregate(
            zip_with(col("embedding"), ct.getField("carr"),
              (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
            lit(0.0), (acc, t) => acc + t),
          ct.getField("k")))))
        .select(col("vec_id"), col("embedding"),
          col("m.k").as("cl"), col("m.col1").as("dist"))
    }

    (1 to iters).foreach { _ =>
      // the one per-iteration shuffle: (cluster, dim) partial-agg means
      // (map-side combine cuts each task to K·dim partial rows before
      // the exchange), then K tiny rows reassembled into centroid arrays
      cent = assigned(cent)
        .select(col("cl"), posexplode(col("embedding")).as(Seq("pos0", "x0")))
        .groupBy(col("cl"), (col("pos0") + 1).as("pos"))
        .agg(Exact.davg(col("x0").cast("double")).as("c"))
        .groupBy(col("cl").as("k"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c")).as("carr"))
    }
    assigned(cent)
      .groupBy(col("cl").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        round(Exact.dsum(col("dist")), 6).as("inertia"))
      .orderBy("cluster")
  }

  def queries: Seq[Q] = Seq(
    // Lloyd k-means over the embedding corpus: K=4, 2 iterations,
    // deterministic first-K init — the codebook-training step ahead of
    // IVF indexing (q_ann_ivf). Output: cluster sizes + exact-decimal
    // inertia, matched against an unrolled-SQL oracle.
    Q("q_kmeans_embed", kmeansOracle) { (s, d) =>
      kmeans(Tables.embeddings(s, d))
    }
  )
}
