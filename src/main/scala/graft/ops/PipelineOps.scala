package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Training-data pipeline operators beyond the dedup/similarity suite
  * (SURVEY.md §2C): repetition-based quality signals, sequence packing,
  * inverted-index construction, and deterministic stratified sampling.
  *
  * Scale posture (100 TB):
  *  - repetition signals and stratified sampling are NARROW per-row
  *    computations (higher-order array functions / a hash compare) — zero
  *    shuffle, fully codegen-friendly, and the sampling predicate is a
  *    plain filter the optimizer can push around freely;
  *  - sequence packing shuffles once, keyed by the shard column
  *    (`source`) — exactly the per-shard parallel packing a real corpus
  *    run uses (shards at 100 TB number in the thousands, so the window
  *    partitions are balanced and plentiful);
  *  - the inverted index aggregates (term, doc) with map-side combine and
  *    caps posting lists BEFORE collecting (row_number pre-filter rides
  *    the same exchange), so a stop-word term can never build an
  *    O(corpus) array in one row.
  */
object PipelineOps extends QueryModule {

  import TextOps.{WordsSql, words}

  /** Token budget per packed training sequence. */
  val SeqTokenBudget = 512

  /** Posting-list cap: keep the first K doc_ids per term. */
  val PostingCap = 20

  def queries: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Gopher-style repetition/quality signals. All three signals are
    // per-row list computations (no explode, no shuffle): the fraction of
    // the document taken by its most frequent word, the fraction of
    // duplicate bigrams, and the mean word length. The distinct-word scan
    // is O(n · distinct) per row — bounded by vocabulary, and entirely
    // inside one codegen stage.
    // ------------------------------------------------------------------
    Q(
      "q_repetition_signals",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |b AS (SELECT doc_id, ws,
         |             list_transform(generate_series(1, len(ws) - 1),
         |                            i -> ws[i] || ' ' || ws[i+1]) AS bg
         |      FROM w WHERE len(ws) >= 2)
         |SELECT doc_id,
         |       CAST(len(ws) AS BIGINT) AS n_tokens,
         |       CAST(list_aggregate(list_transform(list_distinct(ws),
         |                w -> len(list_filter(ws, x -> x = w))), 'max') AS DOUBLE)
         |         / CAST(len(ws) AS BIGINT) AS top_unigram_frac,
         |       1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) AS dup_bigram_frac,
         |       CAST(CAST(list_aggregate(list_transform(ws, x -> len(x)), 'sum') AS BIGINT) AS DOUBLE)
         |         / CAST(len(ws) AS BIGINT) AS mean_word_len
         |FROM b ORDER BY doc_id"""
    ) { (s, d) =>
      val ws = col("ws")
      val bg = col("bg")
      Tables.documents(s, d)
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(ws) >= 2)
        .withColumn("bg", bigrams(ws))
        .select(
          col("doc_id"),
          size(ws).cast("long").as("n_tokens"),
          (array_max(transform(array_distinct(ws),
            w => size(filter(ws, x => x === w)))).cast("double")
            / size(ws).cast("long")).as("top_unigram_frac"),
          (lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg))
            .as("dup_bigram_frac"),
          (aggregate(transform(ws, x => length(x).cast("long")), lit(0L),
            (acc, x) => acc + x).cast("double")
            / size(ws).cast("long")).as("mean_word_len"))
        .orderBy("doc_id")
    },

    // ------------------------------------------------------------------
    // Sequence packing: concatenate each shard's documents in doc_id
    // order and chunk the token stream into fixed 512-token training
    // sequences (the GPT-style pack-then-split discipline; documents may
    // span a sequence boundary). One shuffle, keyed by shard.
    // ------------------------------------------------------------------
    Q(
      "q_seq_pack",
      s"""WITH w AS (
         |  SELECT source, doc_id,
         |         CAST(len($WordsSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, n_tokens,
         |         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM w WHERE n_tokens > 0)
         |SELECT source, doc_id, n_tokens,
         |       (cum - n_tokens) // $SeqTokenBudget AS start_seq,
         |       (cum - 1) // $SeqTokenBudget AS end_seq,
         |       (cum - 1) // $SeqTokenBudget - (cum - n_tokens) // $SeqTokenBudget + 1 AS n_seqs
         |FROM c ORDER BY source, doc_id"""
    ) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          TextOps.wordCount(col("text")).as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(
          col("source"), col("doc_id"), col("n_tokens"),
          ((col("cum") - col("n_tokens")) / SeqTokenBudget).cast("long").as("start_seq"),
          ((col("cum") - 1) / SeqTokenBudget).cast("long").as("end_seq"),
          (((col("cum") - 1) / SeqTokenBudget).cast("long")
            - ((col("cum") - col("n_tokens")) / SeqTokenBudget).cast("long") + 1).as("n_seqs"))
        .orderBy("source", "doc_id")
    },

    // ------------------------------------------------------------------
    // Inverted index: term -> document frequency, total term frequency,
    // and a capped posting list (first 20 doc_ids). The (term, doc)
    // aggregation gets map-side combine for free; the posting cap is a
    // row_number pre-filter that rides the same exchange as the final
    // group-by, so hot terms stay bounded.
    // ------------------------------------------------------------------
    Q(
      "q_inverted_index",
      s"""WITH td AS (
         |  SELECT w AS term, doc_id, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest($WordsSql) AS w FROM documents)
         |  GROUP BY w, doc_id),
         |r AS (
         |  SELECT term, doc_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
         |  FROM td)
         |SELECT term,
         |       COUNT(*) AS df,
         |       CAST(SUM(c) AS BIGINT) AS tf,
         |       string_agg(CASE WHEN rn <= $PostingCap THEN doc_id END, ','
         |                  ORDER BY doc_id) AS posting
         |FROM r GROUP BY term ORDER BY term"""
    ) { (s, d) =>
      val w = Window.partitionBy("term").orderBy("doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .groupBy("term", "doc_id")
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .groupBy("term")
        .agg(
          count(lit(1)).as("df"),
          sum(col("c")).as("tf"),
          array_join(
            transform(
              sort_array(collect_list(when(col("rn") <= PostingCap, col("doc_id")))),
              x => x.cast("string")),
            ",").as("posting"))
        .orderBy("term")
    },

    // ------------------------------------------------------------------
    // Deterministic stratified sampling: per-language rates via a
    // lexicographic compare of an md5-hex prefix against a rate
    // threshold (for fixed-width lowercase hex, string order == numeric
    // order — the same trick the MinHash suite uses). Reproducible
    // across runs and engines, narrow, and trivially pushdown-friendly.
    // Rates: en 1/8, zh 1/2, everything else 1/4.
    // ------------------------------------------------------------------
    Q(
      "q_stratified_sample",
      """SELECT doc_id, lang, h FROM (
        |  SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
        |  FROM documents)
        |WHERE h < CASE lang WHEN 'en' THEN '20000000'
        |                    WHEN 'zh' THEN '80000000'
        |                    ELSE '40000000' END
        |ORDER BY doc_id"""
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8).as("h"))
        .filter(col("h") < when(col("lang") === "en", "20000000")
          .when(col("lang") === "zh", "80000000")
          .otherwise("40000000"))
        .orderBy("doc_id")
    }
  )

  /** Adjacent-word bigrams of a token array (shared helper). */
  private def bigrams(ws: org.apache.spark.sql.Column) =
    transform(sequence(lit(1), size(ws) - 1), i =>
      concat(element_at(ws, i), lit(" "), element_at(ws, i + 1)))
}
