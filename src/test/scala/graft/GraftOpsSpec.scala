package graft

import org.apache.spark.sql.functions._

/** The facade must agree with the oracle-checked registered queries it
  * fronts — a facade that drifts from the verified paths is worse than
  * none.
  */
class GraftOpsSpec extends SparkSpec {

  test("dedupExact keeps exactly the min-ordered row per key") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L, "x3"), ("a", 1L, "x1"), ("b", 2L, "y2"), ("a", 2L, "x2"))
      .toDF("k", "ord", "payload")
    val kept = GraftOps.dedupExact(df, "k", "ord")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(kept == Seq("a" -> 1L, "b" -> 2L))
  }

  test("nearDupCandidates matches the registered LSH pairs query") {
    val viaFacade = GraftOps.nearDupCandidates(
      Tables.documents(spark, sfDir)).orderBy("d1", "d2")
      .collect().map(_.toSeq).toSeq
    val viaQuery = SparkEntry.queries("q_dedup_minhash_pairs")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaFacade == viaQuery && viaFacade.nonEmpty)
  }

  test("cosineTopK matches the registered brute-force query") {
    val emb = Tables.embeddings(spark, sfDir)
    val viaFacade = GraftOps.cosineTopK(emb, emb.filter(col("vec_id") < 10), 5)
      .collect().map(_.toSeq).toSeq
    val viaQuery = SparkEntry.queries("q_similarity_topk")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaFacade == viaQuery && viaFacade.nonEmpty)
  }

  test("curate gates short docs and keeps passthrough columns") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (2L, "too short", "en"))
      .toDF("doc_id", "text", "lang")
    val out = GraftOps.curate(docs, minTokens = 10)
    assert(out.columns.toSet ==
      Set("doc_id", "text", "lang", "n_tokens"))
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    assert(rows.head.getAs[Long]("n_tokens") == 12L)
  }
}
