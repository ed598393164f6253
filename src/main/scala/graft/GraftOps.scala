package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The library facade: the engine's reusable operators as plain
  * DataFrame → DataFrame functions over the CALLER's data, independent of
  * the registered test-query closures. A user of the reference switches
  * by calling these (plus `ocr.OcrPipeline.run` for the R1-R10 flagship);
  * the registered queries in `SparkEntry` exercise the same code paths
  * against the DuckDB oracle.
  *
  * Every function documents its shuffle shape — the contract that matters
  * at 100 TB.
  */
object GraftOps {

  /** Keep the first row (smallest `orderCol`) per exact `keyCol` value.
    * One shuffle on the key; WindowGroupLimit drops losers pre-shuffle.
    */
  def dedupExact(df: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Whitespace-insensitive md5 fingerprint of a text column (the
    * near-exact dedup key). Narrow, codegen'd.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), ops.TextOps.WsRe, " ")))

  /** MinHash/LSH near-duplicate candidate pairs over (doc_id LONG,
    * text STRING) rows. One shuffle keyed by band hash, per-bucket pair
    * expansion hard-capped at [[ops.DedupOps.MaxBucketDocs]].
    */
  def nearDupCandidates(docs: DataFrame): DataFrame =
    ops.DedupOps.lshCandidatePairs(docs)

  /** Bounded top-k rows per query by score, descending, ties by id —
    * two-phase (map-side partials of ≤ k pairs, one tiny shuffle), never
    * a per-query window. Input columns: qid, vid LONG, sim DOUBLE.
    * Output: (qid, vid, sim, rn).
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    ops.SimilarityOps.topkPerQuery(scored, k)

  /** Exact cosine top-k of a small query set against a corpus of
    * (vec_id LONG, embedding ARRAY<FLOAT>). The query set is broadcast;
    * the corpus streams with no shuffle before the bounded top-k.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(
        col("qid"), col("vec_id").as("vid"),
        functions.GraftFunctions.cosine_sim(col("qe"), col("embedding")).as("sim"))
    topKPerQuery(scored, k)
  }

  /** Unicode word count (Go strings.Fields parity), native codegen. */
  def wordCount(text: Column): Column = ops.TextOps.wordCount(text)

  /** Corpus curation: quality-gate (≥ minTokens words, ≥ 1 stopword
    * signal), fingerprint dedup keeping the smallest id, and the kept
    * rows with token counts attached. One narrow pass + one shuffle.
    * Input: (doc_id LONG, text STRING, ...passthrough columns).
    */
  def curate(docs: DataFrame, minTokens: Int = 10): DataFrame = {
    val withSignals = docs
      .withColumn("n_tokens", size(ops.TextOps.words(col("text"))).cast("long"))
      .withColumn("fp", fingerprint(col("text")))
      .filter(col("n_tokens") >= minTokens)
    dedupExact(withSignals, "fp", "doc_id").drop("fp")
  }
}
