package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Similarity search over `embeddings.embedding: array<float>` (SURVEY.md
  * §2C): brute-force cosine top-k as the exactness baseline, sign-LSH
  * bucketing as the scale path, plus embedding-cosine near-dup detection.
  *
  * Float determinism: scoring runs through the native fused
  * `graft.functions.CosineSim` expression — one pass computing dot and
  * both norms with the same left-fold accumulation order as DuckDB's
  * `list_reduce(+)` (0.0 + x == x in IEEE), so cosine values hash-match
  * the oracle bit-for-bit with no rounding fudge. The fold spellings
  * below remain for stats and as the cross-check reference in specs.
  *
  * Scale posture: the query set is small and explicitly `broadcast()` —
  * the corpus side streams through without a shuffle. The LSH variant
  * shuffles once, keyed by bucket, turning O(n·q) scoring into per-bucket
  * work; at 100 TB you'd raise the hyperplane count so buckets stay
  * executor-sized.
  */
object SimilarityOps extends QueryModule {

  /** Left-fold dot product of two array<float> columns in double. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  private def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** sqrt(Σx²) through the codegen [[graft.functions.SqNormF]] — the
    * same ascending left fold in double as [[normSq]] (bit-identical;
    * VecQuantSpec parity), without the interpreted CodegenFallback
    * lambda the `aggregate` spelling plans.
    */
  private def norm(a: Column): Column =
    sqrt(graft.functions.GraftFunctions.sq_norm_f(a))

  /** DuckDB fragments mirroring the folds above. */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
  private def duckNorm(a: String): String =
    s"sqrt(list_reduce(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))"

  /** Sign-pattern LSH bucket over the first `nBits` dimensions
    * (axis-aligned hyperplanes — deterministic and exact on floats).
    */
  private def bucketCol(e: Column, nBits: Int): Column =
    concat((1 to nBits).map(i =>
      when(element_at(e, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)

  private def duckBucket(e: String, nBits: Int): String =
    (1 to nBits).map(i =>
      s"(CASE WHEN $e[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")

  /** Top-k per query via the bounded [[graft.functions.TopKPairAgg]]
    * aggregator — NOT a per-qid ROW_NUMBER window: the query set is
    * scale-fixed (10 ids), so a window would funnel the whole scored
    * corpus into 10 tasks, while the aggregator's map-side partials cut
    * each partition to k pairs before the shuffle. The oracle still
    * states the semantics as ROW_NUMBER (same total order via the vid
    * tiebreak).
    */
  private[graft] def topkPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKPairAgg(k))
    scored
      .groupBy("qid")
      .agg(topk(col("sim"), col("vid")).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(
        col("qid"), col("p._2").as("vid"), col("p._1").as("sim"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy("qid", "rn")
  }

  /** Seed size at which [[knnLabel]] switches from the literal-array
    * narrow path to the broadcast-join + bounded-TopK path: per-row
    * struct-array sorting beats join-row overhead only while the seed
    * is small (measured: 1000-seed literal path 49s vs join path at
    * the same 100x corpus — see PLANS.md round-9).
    */
  val KnnLiteralSeedMax = 256

  /** Hard ceiling on the [[knnLabel]] seed collect — the "curated seed
    * is bounded model state" contract, enforced instead of assumed: a
    * mis-specified seed predicate on a real corpus would otherwise pull
    * corpus-scale embedding rows into the driver. 100k seeds × ~200 B
    * (id + label + a 32-float embedding) ≈ 20 MB of driver heap — model
    * state, comfortably; anything past it is almost certainly a
    * predicate bug, and the operator fails loudly rather than OOM.
    */
  val KnnMaxSeedRows = 100000

  /** k-NN label propagation from a curated seed set (vec_id % 5 = 0,
    * base replica only — a curated seed is fixed-size and does not grow
    * with the corpus): each unlabeled vector takes the majority label
    * of its 3 nearest seed neighbors by cosine (ties: seed id, then
    * smallest label). The seed is bounded model state; the engine picks
    * the physical shape by its measured size — a literal array with an
    * O(S log S) per-row sorted slice (fully narrow, no join) for small
    * seeds, or a broadcast cross join + bounded TopKPairAgg (map-side
    * partials keep 3 pairs per vector) beyond [[KnnLiteralSeedMax]].
    * Both paths are oracle-verified: sf0.01's 100-seed fixture takes
    * the literal path, sf0.1's 1000-seed fixture the join path.
    *
    * EAGER, like the k-means centroid bootstrap and
    * [[GraftOps.bigramLogProb]]: the seed collect (and therefore one
    * Spark job) runs at DataFrame-CONSTRUCTION time, because the
    * physical path choice needs the measured seed size before the plan
    * exists. Callers composing lazy pipelines should call once and
    * reuse. The collect is capped at [[KnnMaxSeedRows]] via
    * `limit(cap + 1)` — ONE job AND the driver never materializes more
    * than cap+1 rows even in the failure path (a count-then-collect
    * spelling pays a second job and still collects unbounded rows if
    * the predicate races a growing table between the two jobs).
    */
  def knnLabel(emb: DataFrame,
      forceLiteral: Option[Boolean] = None,
      maxSeedRows: Int = KnnMaxSeedRows): DataFrame = {
    val isSeed = col("vec_id") % 5 === 0 && col("vec_id") < 10000000L
    val collected = emb.filter(isSeed)
      .select(col("vec_id"), col("label"), col("embedding"))
      .limit(maxSeedRows + 1)
      .collect()
    require(collected.length <= maxSeedRows,
      s"knnLabel: seed predicate matched more than $maxSeedRows rows — " +
        "a curated seed is bounded model state; this is almost certainly " +
        "a mis-specified predicate (raise maxSeedRows only if the seed " +
        "is genuinely this large and the driver heap is sized for it)")
    val seedRows = collected
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
      .sortBy(_._1)
    val labeled =
      if (forceLiteral.getOrElse(seedRows.length <= KnnLiteralSeedMax)) {
        val seedLit = typedLit(seedRows.toSeq)
        val scoredArr = transform(seedLit, sd =>
          struct(
            graft.functions.GraftFunctions
              .cosine_sim(sd.getField("_3"), col("embedding")).as("sim"),
            sd.getField("_1").as("sid"),
            sd.getField("_2").as("lbl")))
        val top3 = slice(array_sort(scoredArr, (a, b) =>
          when(a.getField("sim") > b.getField("sim"), -1)
            .when(a.getField("sim") < b.getField("sim"), 1)
            .otherwise(
              when(a.getField("sid") < b.getField("sid"), -1)
                .when(a.getField("sid") > b.getField("sid"), 1)
                .otherwise(0))
            .cast("int")), 1, 3)
        emb.filter(!isSeed)
          .select(col("label"),
            transform(top3, t => t.getField("lbl")).as("ls"))
      } else {
        // TopKPairAgg keeps (sim desc, id asc) pairs — the identical
        // order the literal path's comparator states; labels rejoin via
        // a seed-bounded literal map after the bounded aggregation
        val seedDf = broadcast(emb.filter(isSeed)
          .select(col("vec_id").as("sid"), col("embedding").as("se")))
        val lblMap = typedLit(seedRows.map(r => r._1 -> r._2).toMap)
        val topk = udaf(new graft.functions.TopKPairAgg(3))
        emb.filter(!isSeed)
          .select(col("vec_id").as("qid"), col("label"), col("embedding"))
          .join(seedDf)
          .select(col("qid"), col("label"),
            graft.functions.GraftFunctions
              .cosine_sim(col("se"), col("embedding")).as("sim"),
            col("sid"))
          .groupBy("qid", "label")
          .agg(topk(col("sim"), col("sid")).as("tk"))
          .select(col("label"),
            transform(col("tk"), p => element_at(lblMap, p.getField("_2")))
              .as("ls"))
      }
    labeled
      .select(col("label"),
        col("ls")(0).as("l1"), col("ls")(1).as("l2"), col("ls")(2).as("l3"))
      .select(col("label").as("true_label"),
        when(col("l1") === col("l2") || col("l1") === col("l3"), col("l1"))
          .when(col("l2") === col("l3"), col("l2"))
          .otherwise(least(col("l1"), col("l2"), col("l3")))
          .as("pred_label"))
      .groupBy("true_label", "pred_label")
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }

  def queries: Seq[Q] = Seq(
    // k-NN label propagation from a curated seed — the weak-supervision
    // labeler: a SMALL labeled seed set (here the vec_id % 5 = 0 fifth,
    // standing in for a hand-curated quality/domain sample) labels the
    // unlabeled corpus by majority vote of each vector's 3 nearest seed
    // neighbors by cosine (ties: seed id, then smallest label when all
    // three disagree). Scale shape: the seed is collected as bounded
    // model state (like the k-means centroids) and rides into the plan
    // as a literal, so scoring is FULLY NARROW — one O(S log S) sorted
    // slice per row, no join, no shuffle before the confusion-matrix
    // aggregation; a larger seed would switch to the broadcast-join +
    // TopKPairAgg path (cosineTopK). Output is the (true, predicted)
    // confusion matrix the labeler's quality is read from.
    Q(
      "q_knn_label",
      s"""WITH sd AS (SELECT vec_id AS sid, label AS lbl, embedding AS se
         |            FROM embeddings WHERE vec_id % 5 = 0 AND vec_id < 10000000),
         |c AS (SELECT vec_id, label, embedding FROM embeddings
         |      WHERE NOT (vec_id % 5 = 0 AND vec_id < 10000000)),
         |scored AS (
         |  SELECT c.vec_id, c.label, sd.sid, sd.lbl,
         |         ${duckDot("c.embedding", "sd.se")} /
         |           (${duckNorm("c.embedding")} * ${duckNorm("sd.se")}) AS sim
         |  FROM c, sd),
         |ranked AS (
         |  SELECT vec_id, label, lbl,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, sid) AS rn
         |  FROM scored),
         |top3 AS (
         |  SELECT vec_id, label,
         |         MAX(CASE WHEN rn = 1 THEN lbl END) AS l1,
         |         MAX(CASE WHEN rn = 2 THEN lbl END) AS l2,
         |         MAX(CASE WHEN rn = 3 THEN lbl END) AS l3
         |  FROM ranked WHERE rn <= 3 GROUP BY 1, 2)
         |SELECT label AS true_label,
         |       CASE WHEN l1 = l2 OR l1 = l3 THEN l1
         |            WHEN l2 = l3 THEN l2
         |            ELSE LEAST(l1, l2, l3) END AS pred_label,
         |       COUNT(*) AS n
         |FROM top3 GROUP BY 1, 2 ORDER BY 1, 2"""
    ) { (s, d) => knnLabel(Tables.embeddings(s, d)) },
    // Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25
    // lexical top-20 and the cosine-similarity top-20 for one query
    // (terms for the lexical side, vector 0's embedding for the dense
    // side) — the fusion step of a modern retrieval stack, composed
    // from the two independently-verified scoring paths. Both rank
    // lists are bounded (20 rows) before the full-outer fuse, so the
    // fusion itself is constant-size at any corpus scale; RRF terms are
    // a fixed two-addend double expression (no aggregation), so no
    // rounding is needed.
    Q(
      "q_hybrid_rrf",
      s"""WITH ${PipelineOps.Bm25Cte},
         |brank AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r1
         |  FROM bmscore),
         |btop AS (SELECT doc_id, r1 FROM brank WHERE r1 <= 20),
         |cscored AS (
         |  SELECT e.vec_id AS vid,
         |         ${duckDot("q.embedding", "e.embedding")}
         |           / (${duckNorm("q.embedding")} * ${duckNorm("e.embedding")}) AS sim
         |  FROM embeddings e
         |  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0),
         |crank AS (
         |  SELECT vid, ROW_NUMBER() OVER (ORDER BY sim DESC, vid) AS r2
         |  FROM cscored),
         |ctop AS (SELECT vid, r2 FROM crank WHERE r2 <= 20)
         |SELECT COALESCE(b.doc_id, c.vid) AS doc_id,
         |       COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.r1), 0)
         |         + COALESCE(CAST(1.0 AS DOUBLE) / (60 + c.r2), 0) AS rrf
         |FROM btop b FULL OUTER JOIN ctop c ON b.doc_id = c.vid
         |ORDER BY rrf DESC, doc_id LIMIT 10"""
    ) { (s, d) =>
      val wTop = Window.orderBy(col("score").desc, col("doc_id"))
      // rank windows run over the already-bounded 20-row top lists
      val bmTop = PipelineOps
        .bm25Scores(Tables.documents(s, d), PipelineOps.Bm25Terms)
        .orderBy(col("score").desc, col("doc_id")).limit(20)
        .withColumn("r1", row_number().over(wTop).cast("long"))
        .select(col("doc_id").as("d1"), col("r1"))
      val emb = Tables.embeddings(s, d)
      val cosTop = graft.GraftOps
        .cosineTopK(emb, emb.filter(col("vec_id") === 0), 20)
        .select(col("vid").as("d2"), col("rn").cast("long").as("r2"))
      bmTop
        .join(cosTop, col("d1") === col("d2"), "full_outer")
        .select(
          coalesce(col("d1"), col("d2")).as("doc_id"),
          (coalesce(lit(1.0) / (lit(60) + col("r1")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("r2")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },

    // Brute-force cosine top-k: exact baseline. Query set (vec_id < 10)
    // broadcast against the full corpus; rank per query.
    Q(
      "q_similarity_topk",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT qid, e.vec_id AS vid,
         |         ${duckDot("qe", "e.embedding")} /
         |           (${duckNorm("qe")} * ${duckNorm("e.embedding")}) AS sim
         |  FROM q, embeddings e
         |  WHERE e.vec_id <> qid),
         |ranked AS (
         |  SELECT qid, vid, sim,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
         |  FROM scored)
         |SELECT qid, vid, sim, CAST(rn AS INT) AS rn
         |FROM ranked WHERE rn <= 5 ORDER BY qid, rn"""
    ) { (s, d) =>
      // routed through the public facade (self-search: queries are
      // corpus rows, so excludeSelf applies) — the oracle verifies the
      // code path a library user calls
      val emb = Tables.embeddings(s, d)
      graft.GraftOps.cosineTopK(emb, emb.filter(col("vec_id") < 10), 5)
    },

    // Sign-LSH bucketed ANN: candidates share an 8-bit sign bucket; only
    // per-bucket pairs are scored. The recall/latency trade of a real ANN
    // index, expressed as one bucket-keyed shuffle.
    Q(
      "q_ann_lsh",
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${duckBucket("embedding", 8)} AS bucket
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb FROM b WHERE vec_id < 10),
         |scored AS (
         |  SELECT qid, b.vec_id AS vid,
         |         ${duckDot("qe", "b.embedding")} /
         |           (${duckNorm("qe")} * ${duckNorm("b.embedding")}) AS sim
         |  FROM q JOIN b ON b.bucket = qb AND b.vec_id <> qid),
         |ranked AS (
         |  SELECT qid, vid, sim,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
         |  FROM scored)
         |SELECT qid, vid, sim, CAST(rn AS INT) AS rn
         |FROM ranked WHERE rn <= 3 ORDER BY qid, rn"""
    ) { (s, d) =>
      val b = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), bucketCol(col("embedding"), 8).as("bucket"))
      val q = b.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket").as("qb"))
      val scored = b
        .join(broadcast(q), col("bucket") === col("qb") && col("vec_id") =!= col("qid"))
        .select(
          col("qid"), col("vec_id").as("vid"),
          graft.functions.GraftFunctions.cosine_sim(col("qe"), col("embedding")).as("sim"))
      topkPerQuery(scored, 3)
    },

    // Per-label embedding stats; norm sums go through the decimal-exact
    // path since sqrt outputs are summed across rows.
    Q(
      "q_embedding_stats",
      s"""WITH n AS (SELECT label, ${duckNorm("embedding")} AS nrm FROM embeddings)
         |SELECT label,
         |       COUNT(*) AS n_vecs,
         |       CAST(MIN(nrm) AS DOUBLE) AS min_norm,
         |       CAST(MAX(nrm) AS DOUBLE) AS max_norm,
         |       CAST(SUM(CAST(nrm AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avg_norm
         |FROM n GROUP BY label ORDER BY label"""
    ) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), norm(col("embedding")).as("nrm"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n_vecs"),
          min(col("nrm")).cast("double").as("min_norm"),
          max(col("nrm")).cast("double").as("max_norm"),
          Exact.davg(col("nrm")).as("avg_norm"))
        .orderBy("label")
    },

    // Embedding-cosine near-dup: top-20 most-similar pairs in a bounded
    // candidate window (vec_id < 100 → ~5k pairs at any SF).
    Q(
      "q_embedding_neardup",
      s"""WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
         |pairs AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2,
         |         ${duckDot("a.embedding", "b.embedding")} /
         |           (${duckNorm("a.embedding")} * ${duckNorm("b.embedding")}) AS sim
         |  FROM c a JOIN c b ON a.vec_id < b.vec_id)
         |SELECT v1, v2, sim FROM pairs
         |ORDER BY sim DESC, v1, v2 LIMIT 20"""
    ) { (s, d) =>
      val c = Tables.embeddings(s, d).filter(col("vec_id") < 100)
      val a = c.select(col("vec_id").as("v1"), col("embedding").as("e1"))
      val b = c.select(col("vec_id").as("v2"), col("embedding").as("e2"))
      a.join(broadcast(b), col("v1") < col("v2"))
        .select(
          col("v1"), col("v2"),
          graft.functions.GraftFunctions.cosine_sim(col("e1"), col("e2")).as("sim"))
        .orderBy(col("sim").desc, col("v1"), col("v2"))
        .limit(20)
    },

    // Per-label centroids: element-wise mean over array<float> columns by
    // exploding to (label, pos, v) — the aggregation shuffles on
    // (label, pos), a key that scales with labels × dims, never loading
    // a whole label's vectors into one task. The building block for IVF
    // codebook training / k-means steps; decimal-exact means.
    Q(
      "q_embedding_centroid",
      """WITH e AS (
        |  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i))
        |SELECT label, CAST(pos AS INT) AS pos,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(v AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS mean_v
        |FROM e GROUP BY label, pos ORDER BY label, pos"""
    ) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v0")))
        .select(
          col("label"),
          (col("pos0") + 1).cast("int").as("pos"),
          col("v0").cast("double").as("v"))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"), Exact.davg(col("v")).as("mean_v"))
        .orderBy("label", "pos")
    },

    // 8-bit scalar quantization — the embedding-compression step an ANN
    // deployment runs before indexing (4x smaller vectors at 100 TB).
    // Per-dimension min/max codebook (comparison-only, exact), codes by
    // identical IEEE arithmetic on both sides, then per-dimension
    // reconstruction-error stats. The codebook is dimension-sized and
    // broadcast; the corpus passes are explode → partial-agg shuffles
    // (64 groups, but map-side partials shrink each task to 64 rows
    // before the exchange — the standard low-cardinality-groupBy shape,
    // NOT a window funnel).
    Q(
      "q_embedding_quantize",
      """WITH e AS (
        |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
        |cb AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY pos),
        |q AS (
        |  SELECT e.pos, cb.mn, cb.mx,
        |         CASE WHEN cb.mx = cb.mn THEN 0
        |              ELSE LEAST(CAST(floor((e.x - cb.mn) * 255 / (cb.mx - cb.mn)) AS INT), 255)
        |         END AS code,
        |         e.x
        |  FROM e JOIN cb ON e.pos = cb.pos),
        |r AS (
        |  SELECT pos, mn, mx, code,
        |         abs(x - (mn + (CAST(code AS DOUBLE) + 0.5) * (mx - mn) / 255)) AS err
        |  FROM q)
        |SELECT CAST(pos AS INT) AS pos, MIN(mn) AS mn, MAX(mx) AS mx,
        |       COUNT(DISTINCT code) AS n_codes,
        |       floor(CAST(SUM(CAST(err AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
        |         AS avg_abs_err
        |FROM r GROUP BY pos ORDER BY pos"""
    ) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "x0")))
        .select(
          (col("pos0") + 1).cast("int").as("pos"),
          col("x0").cast("double").as("x"))
      val cb = e.groupBy("pos").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      e.join(broadcast(cb), "pos")
        .withColumn("code",
          when(col("mx") === col("mn"), lit(0))
            .otherwise(least(
              floor((col("x") - col("mn")) * 255 / (col("mx") - col("mn"))).cast("int"),
              lit(255))))
        .withColumn("err",
          abs(col("x") - (col("mn")
            + (col("code").cast("double") + 0.5) * (col("mx") - col("mn")) / 255)))
        .groupBy("pos")
        .agg(
          min(col("mn")).as("mn"), max(col("mx")).as("mx"),
          countDistinct(col("code")).as("n_codes"),
          Exact.round6(Exact.dsum(col("err")) / count(lit(1))).as("avg_abs_err"))
        .orderBy("pos")
    },

    // ANN quality measurement: recall@3 of the sign-LSH index against the
    // exact brute-force top-3, per query, at TWO hyperplane counts —
    // "measure, don't guess" applied to the index itself. The synthetic
    // embeddings are near-random (no cluster structure), so recall is
    // bounded by the candidate fraction — exactly what this measurement
    // exposes: fewer bits ⇒ bigger buckets ⇒ higher recall (the tuning
    // knob a 100 TB deployment turns over a sampled query set). Fully
    // deterministic, so it takes a full value oracle.
    Q(
      "q_ann_recall",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT qid, e.vec_id AS vid,
         |         ${duckDot("qe", "e.embedding")} /
         |           (${duckNorm("qe")} * ${duckNorm("e.embedding")}) AS sim
         |  FROM q, embeddings e WHERE e.vec_id <> qid),
         |exact AS (
         |  SELECT qid, vid FROM (
         |    SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
         |    FROM scored) WHERE rn <= 3),
         |b8 AS (SELECT vec_id, embedding, ${duckBucket("embedding", 8)} AS bucket FROM embeddings),
         |q8 AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qbk FROM b8 WHERE vec_id < 10),
         |s8 AS (
         |  SELECT qid, b8.vec_id AS vid,
         |         ${duckDot("qe", "b8.embedding")} /
         |           (${duckNorm("qe")} * ${duckNorm("b8.embedding")}) AS sim
         |  FROM q8 JOIN b8 ON b8.bucket = qbk AND b8.vec_id <> qid),
         |a8 AS (
         |  SELECT qid, vid FROM (
         |    SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
         |    FROM s8) WHERE rn <= 3),
         |b2 AS (SELECT vec_id, embedding, ${duckBucket("embedding", 2)} AS bucket FROM embeddings),
         |q2 AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qbk FROM b2 WHERE vec_id < 10),
         |s2 AS (
         |  SELECT qid, b2.vec_id AS vid,
         |         ${duckDot("qe", "b2.embedding")} /
         |           (${duckNorm("qe")} * ${duckNorm("b2.embedding")}) AS sim
         |  FROM q2 JOIN b2 ON b2.bucket = qbk AND b2.vec_id <> qid),
         |a2 AS (
         |  SELECT qid, vid FROM (
         |    SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
         |    FROM s2) WHERE rn <= 3)
         |SELECT e.qid,
         |       COUNT(a8.vid) AS hits_8bit, COUNT(a8.vid) / 3.0 AS recall_8bit,
         |       COUNT(a2.vid) AS hits_2bit, COUNT(a2.vid) / 3.0 AS recall_2bit
         |FROM exact e
         |LEFT JOIN a8 ON a8.qid = e.qid AND a8.vid = e.vid
         |LEFT JOIN a2 ON a2.qid = e.qid AND a2.vid = e.vid
         |GROUP BY e.qid ORDER BY e.qid"""
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val exact = topkPerQuery(
        emb.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("vid"),
            graft.functions.GraftFunctions.cosine_sim(col("qe"), col("embedding")).as("sim")),
        3).select("qid", "vid")
      def lshTop3(nBits: Int) = {
        val b = emb.select(
          col("vec_id"), col("embedding"), bucketCol(col("embedding"), nBits).as("bucket"))
        val qB = b.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket").as("qbk"))
        topkPerQuery(
          b.join(broadcast(qB), col("bucket") === col("qbk") && col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id").as("vid"),
              graft.functions.GraftFunctions.cosine_sim(col("qe"), col("embedding")).as("sim")),
          3).select(col("qid").as(s"q$nBits"), col("vid").as(s"v$nBits"))
      }
      exact
        .join(broadcast(lshTop3(8)),
          col("qid") === col("q8") && col("vid") === col("v8"), "left")
        .join(broadcast(lshTop3(2)),
          col("qid") === col("q2") && col("vid") === col("v2"), "left")
        .groupBy("qid")
        .agg(
          count(col("v8")).as("hits_8bit"),
          count(col("v2")).as("hits_2bit"))
        .select(
          col("qid"),
          col("hits_8bit"), (col("hits_8bit") / 3.0).as("recall_8bit"),
          col("hits_2bit"), (col("hits_2bit") / 3.0).as("recall_2bit"))
        .orderBy("qid")
    }
  )
}
