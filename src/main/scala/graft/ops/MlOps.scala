package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Distributed ML training primitives over the embeddings table.
  *
  * K-means (Lloyd) is the canonical one: it is the TRAINING step behind
  * the IVF coarse quantizer (`q_ann_ivf` searches a fixed codebook; this
  * module trains one, and `q_ann_ivf_trained` chains
  * train → index → search → recall measurement — the full pipeline a
  * real ANN deployment runs). The 100 TB shape: ASSIGNMENT IS NARROW —
  * the K·dim centroid table rides a broadcast and each vector folds its
  * squared distances in one codegen'd pass, so the corpus-scale data
  * never shuffles to be assigned; the only per-iteration shuffle is the
  * centroid UPDATE (a partial-aggregated (cluster, dim) mean — the
  * reduce step no formulation avoids). Iteration count is a small
  * constant and the corpus frame is localCheckpoint'd once.
  *
  * Determinism: per-vector distances are left folds (IEEE-identical to
  * DuckDB's `list_reduce`, 0.0 + x == x); assignment ties break to the
  * smallest cluster id; centroid means and the final inertia use the
  * Exact decimal-sum pattern; the oracle unrolls the same loop.
  *
  * Empty-cluster contract: a centroid that loses every member in an
  * update round is DROPPED (the (cluster, dim) mean aggregation only
  * produces rows for assigned clusters), so the trained codebook — and
  * therefore `kmeans`'s cluster summary — can have fewer than `k` rows.
  * This is standard Lloyd-without-reseeding behavior and is what the
  * unrolled oracle computes too; callers who need exactly `k` cells
  * must re-seed externally.
  */
object MlOps extends QueryModule {

  private val K = 4
  private val Iters = 2

  /** DuckDB fragments mirroring the Spark-side left folds. */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
  private def duckNorm(a: String): String =
    s"sqrt(list_reduce(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))"

  private def assignCte(k: Int): String =
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

  /** Shared oracle prefix: c0 seed + `Iters` unrolled Lloyd rounds +
    * the final assignment CTE `a{Iters}`, generated from the same loop
    * shape as the Spark side.
    */
  private def lloydCtes: String = {
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
    s"""c0 AS (
       |  SELECT vec_id AS k, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS carr
       |  FROM embeddings WHERE vec_id < $K),
       |$steps,
       |${assignCte(Iters)}""".stripMargin
  }

  private def kmeansOracle: String =
    s"""WITH $lloydCtes
       |SELECT cl AS cluster,
       |       COUNT(*) AS n_vecs,
       |       round(CAST(SUM(CAST(dist AS DECIMAL(38,10))) AS DOUBLE), 6) AS inertia
       |FROM a$Iters GROUP BY cl ORDER BY cluster""".stripMargin

  /** IVF-with-trained-codebook oracle: the Lloyd CTEs feed the cell
    * assignment, queries search their own cell only, and recall@3 is
    * measured against the exact brute-force top-3.
    */
  private def ivfTrainedOracle: String =
    s"""WITH $lloydCtes,
       |q AS (
       |  SELECT a.vec_id AS qid, e.embedding AS qe, a.cl AS qcell
       |  FROM a$Iters a JOIN embeddings e ON e.vec_id = a.vec_id
       |  WHERE a.vec_id < 10),
       |cand AS (
       |  SELECT a.vec_id AS vid, e.embedding AS ve, a.cl AS cell
       |  FROM a$Iters a JOIN embeddings e ON e.vec_id = a.vec_id),
       |ivfscored AS (
       |  SELECT qid, vid,
       |         ${duckDot("qe", "ve")} / (${duckNorm("qe")} * ${duckNorm("ve")}) AS sim
       |  FROM q JOIN cand ON cand.cell = q.qcell AND vid <> qid),
       |ivftop AS (
       |  SELECT qid, vid FROM (
       |    SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
       |    FROM ivfscored) WHERE rn <= 3),
       |exscored AS (
       |  SELECT q2.qid, e.vec_id AS vid,
       |         ${duckDot("q2.qe", "e.embedding")} /
       |           (${duckNorm("q2.qe")} * ${duckNorm("e.embedding")}) AS sim
       |  FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10) q2,
       |       embeddings e WHERE e.vec_id <> q2.qid),
       |extop AS (
       |  SELECT qid, vid FROM (
       |    SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
       |    FROM exscored) WHERE rn <= 3)
       |SELECT e.qid, COUNT(i.vid) AS hits, COUNT(i.vid) / 3.0 AS recall_at3
       |FROM extop e
       |LEFT JOIN ivftop i ON i.qid = e.qid AND i.vid = e.vid
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  /** FULLY NARROW assignment: the K centroids collapse to a ONE-ROW
    * broadcast array of (carr, k) structs, and each vector computes its
    * argmin as a per-row expression — fold the squared distance per
    * centroid, array_min over (dist, k) structs (smallest distance,
    * ties to the smallest cluster id — the same pair the oracle's
    * min-join selects). The corpus-scale rows — embedding payload
    * included — never enter ANY exchange: the n×K candidate rows a
    * join-based assignment would shuffle and re-collapse never exist.
    * Output: (vec_id, embedding, cl, dist).
    */
  private def assignTo(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val centRow = cent.agg(collect_list(struct(col("carr"), col("k"))).as("cents"))
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

  /** Lloyd training loop over a checkpointed (vec_id, embedding) frame.
    * Returns the trained codebook (k, carr: array<double>) — possibly
    * fewer than `k` rows (see the empty-cluster contract above).
    */
  private def train(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    var cent = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("k"),
        transform(col("embedding"), v => v.cast("double")).as("carr"))
    (1 to iters).foreach { _ =>
      // the one per-iteration shuffle: (cluster, dim) partial-agg means
      // (map-side combine cuts each task to K·dim partial rows before
      // the exchange), then K tiny rows reassembled into centroid arrays
      cent = assignTo(vecs, cent)
        .select(col("cl"), posexplode(col("embedding")).as(Seq("pos0", "x0")))
        .groupBy(col("cl"), (col("pos0") + 1).as("pos"))
        .agg(Exact.davg(col("x0").cast("double")).as("c"))
        .groupBy(col("cl").as("k"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c")).as("carr"))
    }
    cent
  }

  private def checkpointed(emb: DataFrame): DataFrame =
    // materialize the corpus once; every assignment/update pass reads it
    // back instead of re-scanning
    emb.select(col("vec_id"), col("embedding")).localCheckpoint()

  /** Trained k-means codebook: (k, carr: array<double>), ≤ `k` rows. */
  def kmeansCentroids(emb: DataFrame, k: Int = K, iters: Int = Iters): DataFrame =
    train(checkpointed(emb), k, iters)

  /** Cluster summary after training: (cluster, n_vecs, inertia). */
  def kmeans(emb: DataFrame, k: Int = K, iters: Int = Iters): DataFrame = {
    val vecs = checkpointed(emb)
    assignTo(vecs, train(vecs, k, iters))
      .groupBy(col("cl").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        round(Exact.dsum(col("dist")), 6).as("inertia"))
      .orderBy("cluster")
  }

  /** The chained ANN pipeline: train the coarse quantizer with k-means,
    * assign every vector to its nearest trained centroid (narrow
    * broadcast fold, same as training), search each query's cell only,
    * and measure recall@`topk` against the exact brute-force top-`topk`.
    * Output: (qid, hits, recall_at<topk>) per query.
    */
  def ivfTrainedRecall(
      emb: DataFrame, k: Int = K, iters: Int = Iters, topk: Int = 3): DataFrame = {
    val vecs = checkpointed(emb)
    // the trained codebook is K tiny rows reused by two passes below —
    // checkpoint it so each pass doesn't re-run the training plan
    val cent = train(vecs, k, iters).localCheckpoint()
    val withCell = assignTo(vecs, cent)
      .select(col("vec_id"), col("embedding"), col("cl").as("cell"))
    val q = withCell.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell").as("qcell"))
    val ivfTop = SimilarityOps.topkPerQuery(
      withCell
        .join(broadcast(q), col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid"),
          graft.functions.GraftFunctions.cosine_sim(col("qe"), col("embedding")).as("sim")),
      topk).select(col("qid").as("iq"), col("vid").as("iv"))
    val exactTop = SimilarityOps.topkPerQuery(
      vecs
        .join(broadcast(q.select(col("qid"), col("qe"))), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid"),
          graft.functions.GraftFunctions.cosine_sim(col("qe"), col("embedding")).as("sim")),
      topk).select("qid", "vid")
    exactTop
      .join(broadcast(ivfTop),
        col("qid") === col("iq") && col("vid") === col("iv"), "left")
      .groupBy("qid")
      .agg(count(col("iv")).as("hits"))
      .select(col("qid"), col("hits"),
        (col("hits") / topk.toDouble).as(s"recall_at$topk"))
      .orderBy("qid")
  }

  def queries: Seq[Q] = Seq(
    // Lloyd k-means over the embedding corpus: K=4, 2 iterations,
    // deterministic first-K init — the codebook-training step ahead of
    // IVF indexing (q_ann_ivf). Output: cluster sizes + exact-decimal
    // inertia, matched against an unrolled-SQL oracle.
    Q("q_kmeans_embed", kmeansOracle) { (s, d) =>
      kmeans(Tables.embeddings(s, d))
    },

    // train → index → search → measure: the trained codebook (not the
    // fixed first-16 one q_ann_ivf uses) becomes the IVF coarse
    // quantizer, and recall@3 against exact top-3 quantifies what the
    // cell restriction costs — the full loop a 100 TB ANN deployment
    // runs, with the cluster count as the scale knob.
    Q("q_ann_ivf_trained", ivfTrainedOracle) { (s, d) =>
      // routed through the public facade so the oracle verifies the
      // exact code path a library user calls
      graft.GraftOps.annIvfTrainedRecall(Tables.embeddings(s, d))
    }
  )
}
