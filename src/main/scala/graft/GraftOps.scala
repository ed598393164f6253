package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The library facade: the engine's reusable operators as plain
  * DataFrame → DataFrame functions over the CALLER's data. The registered
  * oracle queries are built ON TOP of these functions (q_dedup_exact,
  * q_dedup_fingerprint, q_similarity_topk, q_corpus_curation,
  * q_dedup_minhash_pairs all route through here), so the DuckDB gate
  * verifies the exact code a library user calls — not a parallel copy
  * that could drift.
  *
  * Every function documents its shuffle shape — the contract that matters
  * at 100 TB. Internal working columns are `__graft_`-prefixed so caller
  * columns can't collide.
  */
object GraftOps {

  /** Keep the first row (smallest `orderCol`) per exact `keyCol` value.
    *
    * Spelled SORT-FREE: a map-side-combinable `min(orderCol)` keeper
    * aggregation (plain codegen HashAggregate — the only state that
    * crosses its exchange is (key, min order), ~24 bytes with a digest
    * key) followed by a left-SEMI join back, HINTED to a shuffled HASH
    * join. The row_number window this replaces — and the min_by(struct)
    * spelling Spark plans as SortAggregate (struct buffers can't ride
    * hash aggregation) — both SORT the full row payload, text included,
    * on each side of the exchange; at 100 TB with a near-unique
    * fingerprint key that sort is the heaviest avoidable cost in a
    * curation pipeline. Here the payload crosses its one exchange
    * unsorted and probes a per-partition hash table of the narrow
    * keeper set. The hint matters at scale: unhinted, a fact-sized
    * keeper set exceeds broadcast range and the planner's sort-merge
    * fallback would re-introduce both payload sorts.
    *
    * Cost honestly stated: the input is computed twice (keeper pass +
    * probe pass), but the keeper pass prunes to (key, order) columns
    * — two codegen column-pruned scans beat one full-payload sort at
    * any scale where this operator matters.
    *
    * `orderUnique = true` asserts `orderCol` is GLOBALLY unique (a
    * doc_id-style row id): the keeper set is then exactly the output
    * row-id set, so the semi join probes on `orderCol` ALONE — the
    * probe side never computes the (often regex-derived) key column at
    * all (Catalyst prunes it), and the join keys are bare longs
    * instead of digests.
    *
    * Contract: `orderCol` must be non-null and unique within a key —
    * under order ties the semi join would keep every tied row where
    * the window kept an arbitrary one.
    */
  def dedupExact(df: DataFrame, keyCol: String, orderCol: String,
      orderUnique: Boolean = false): DataFrame = {
    val keepers = df.groupBy(col(keyCol))
      .agg(min(col(orderCol)).as(orderCol))
      .hint("shuffle_hash")
    val joinKeys = if (orderUnique) Seq(orderCol) else Seq(keyCol, orderCol)
    df.join(keepers.select(joinKeys.map(col): _*), joinKeys, "left_semi")
      // a USING join moves the join columns first — restore the
      // caller's schema order (output contract: input rows, unchanged)
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Whitespace-insensitive md5 fingerprint of a text column (the
    * near-exact dedup key). Narrow, codegen'd — and REGEX-FREE: the
    * whitespace collapse rides the native single-pass tokenizer
    * (`graft_words`) instead of `regexp_replace`, which was the
    * measured bulk of the keeper-pass scan in q_corpus_curation.
    * Equivalent to `md5(trim(regexp_replace(lower(text), WS, " ")))`
    * (the oracle's spelling) because Unicode simple lowercasing maps no
    * character into or out of the whitespace class, so collapse-then-
    * lower and lower-then-collapse produce the same normalized string
    * — pinned by a property test against the regex spelling.
    */
  def fingerprint(text: Column): Column =
    md5(lower(concat_ws(" ", ops.TextOps.words(text))))

  /** MinHash/LSH near-duplicate candidate pairs over (doc_id LONG,
    * text STRING) rows. One shuffle keyed by band hash, per-bucket pair
    * expansion hard-capped at [[ops.DedupOps.MaxBucketDocs]].
    */
  def nearDupCandidates(docs: DataFrame): DataFrame =
    ops.DedupOps.lshCandidatePairs(docs)

  /** Near-dup connected components over (doc_id LONG, text STRING) rows:
    * (doc_id, component) where component = smallest doc_id reachable
    * through LSH candidate edges (the cluster keeper). Covers EVERY
    * input doc: singleton docs (no near-dup candidate, the majority of
    * a healthy corpus) come back as their own component, so joining the
    * result to the corpus never drops rows. The propagation itself runs
    * on the edge-node set only (fact-scale docs never enter the
    * iteration); the singleton closure is one left join.
    * Verified by `q_dedup_clusters` (edge-node subset) and
    * GraftOpsSpec (isolated docs).
    */
  def nearDupComponents(docs: DataFrame): DataFrame = {
    val edgeComps = ops.DedupOps.nearDupComponents(docs)
      .withColumnRenamed("component", "__graft_comp")
    docs.select("doc_id")
      .join(edgeComps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__graft_comp"), col("doc_id")).as("component"))
  }

  /** The near-deduplicated corpus: `docs` (doc_id LONG, text STRING, any
    * other columns) minus every non-keeper cluster member — the
    * materialization step a pipeline runs after clustering. Verified by
    * `q_dedup_corpus`.
    */
  def dedupNear(docs: DataFrame): DataFrame =
    ops.DedupOps.dedupNearCorpus(docs)

  /** [[dedupNear]] with the cluster keeper chosen by quality instead of
    * arrival id: per near-dup cluster, keep the member with the highest
    * `q_quality_score` blend (tie → smallest doc_id) — the selection
    * rule real curation runs, since clusters usually mix a clean
    * original with boilerplate-wrapped or truncated copies. Adds
    * `is_swapped` (kept AND not the min-id member). Verified by
    * `q_dedup_keep_best`.
    */
  def dedupKeepBest(docs: DataFrame): DataFrame =
    ops.DedupOps.keepBestCorpus(docs)

  /** Product-quantization ANN: per-block codebooks (blocks·kb·subdim
    * doubles of model state), the corpus encoded to `blocks` small
    * codes per vector in one narrow pass, queries scored by
    * asymmetric distance through broadcast per-block tables — the
    * memory-bound path that makes billion-vector indexes fit RAM. The
    * registered form is PQ-flat (full-corpus ADC scan); compose with
    * the IVF probe for IVF-PQ at deployment scale. Verified by
    * `q_ann_pq` (exact-decimal ADC sums pin the full ranking).
    */
  def pqSearch(emb: DataFrame, blocks: Int = 8, kb: Int = 16,
      nQueries: Int = 10, topk: Int = 3): DataFrame =
    ops.MlOps.pqSearch(emb, blocks, kb, nQueries = nQueries, topk = topk)

  /** Bounded top-k rows per query by score, descending, ties by id —
    * two-phase (map-side partials of ≤ k pairs, one tiny shuffle), never
    * a per-query window. Input columns: qid, vid LONG, sim DOUBLE.
    * Output: (qid, vid, sim, rn).
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    ops.SimilarityOps.topkPerQuery(scored, k)

  /** Exact cosine top-k of a small query set against a corpus, both
    * shaped (vec_id LONG, embedding ARRAY<FLOAT>). The query set is
    * broadcast; the corpus streams with no shuffle before the bounded
    * top-k. `excludeSelf` drops corpus rows whose vec_id equals the
    * query's id — correct when the queries ARE corpus rows (the
    * self-search case); set it false when the two id spaces are
    * independent, or an unrelated corpus vector sharing a query's id
    * would be silently skipped.
    */
  def cosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cond = if (excludeSelf) col("vec_id") =!= col("qid") else lit(true)
    val scored = corpus
      .join(broadcast(q), cond)
      .select(
        col("qid"), col("vec_id").as("vid"),
        functions.GraftFunctions.cosine_sim(col("qe"), col("embedding")).as("sim"))
    topKPerQuery(scored, k)
  }

  /** Unicode word count (Go strings.Fields parity), native codegen. */
  def wordCount(text: Column): Column = ops.TextOps.wordCount(text)

  /** Gopher-style repetition/quality signals for (doc_id, text) rows:
    * `n_tokens`, `top_unigram_frac`, `dup_bigram_frac`, `mean_word_len`.
    * Entirely narrow (per-row higher-order array functions, no shuffle);
    * docs with fewer than 2 words are dropped (no bigram signal).
    * Verified by `q_repetition_signals`.
    */
  def repetitionSignals(docs: DataFrame): DataFrame =
    ops.PipelineOps.repetitionSignals(docs)

  /** GPT-style sequence packing: concatenate each shard's documents in
    * `idCol` order and chunk into `budget`-token training sequences
    * (documents may span boundaries). One shuffle keyed by `shardCol`.
    * Adds `n_tokens`, `start_seq`, `end_seq`, `n_seqs`. Verified by
    * `q_seq_pack`.
    */
  def packSequences(
      docs: DataFrame, shardCol: String = "source", idCol: String = "doc_id",
      budget: Int = ops.PipelineOps.SeqTokenBudget): DataFrame =
    ops.PipelineOps.packSequences(docs, shardCol, idCol, budget)

  /** Inverted index over (doc_id, text) rows: term → document frequency,
    * total term frequency, and the first `cap` doc_ids as a posting
    * string. Map-side combine on (term, doc); the posting cap is applied
    * BEFORE any collect, so hot terms stay bounded. Verified by
    * `q_inverted_index`.
    */
  def invertedIndex(
      docs: DataFrame, cap: Int = ops.PipelineOps.PostingCap): DataFrame =
    ops.PipelineOps.invertedIndex(docs, cap)

  /** Sampling threshold for a rate in [0, 1] — `hashSample` keeps a row
    * when the md5-hex prefix of its id is strictly below this. Rates
    * below 1 map to the 8-hex-char prefix of `rate · 2^32`; rate 1.0
    * returns `"g"`, which sorts above every hex string, so
    * keep-everything really keeps rows whose prefix is `"ffffffff"` too.
    */
  def sampleThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.round(rate.max(0) * 4294967296.0).min(4294967295L)}%08x"

  /** Deterministic stratified sampling: keep a row when the md5-hex
    * prefix of `idCol` is lexicographically below its stratum's
    * threshold (see [[sampleThreshold]]; fixed-width lowercase hex
    * compares like the number it encodes). Reproducible across runs,
    * engines, and cluster layouts; narrow and pushdown-friendly.
    * OUTPUT CONTRACT: the hex prefix is appended as column `hashCol`
    * (default `"h"`, replacing any existing column of that name — pass a
    * different name if the input already uses it). Verified by
    * `q_stratified_sample`.
    */
  def hashSample(
      df: DataFrame, idCol: String, strataCol: String,
      thresholds: Map[String, String], defaultThreshold: String,
      hashCol: String = "h"): DataFrame =
    ops.PipelineOps.hashSample(df, idCol, strataCol, thresholds, defaultThreshold, hashCol)

  /** Semi join `fact` to `dim`'s keys with a Bloom-sketch prefilter: the
    * sketch is built over the dim keys distributedly (only ~KB reach the
    * driver), broadcast into a fact-side filter, and the exact join runs
    * after it. No false negatives, so results are exactly the semi join —
    * the sketch only cuts fact rows before the join exchange. The final
    * join's strategy is left to the planner/AQE (a dim past broadcast
    * range falls back to a shuffle join — the case the prefilter exists
    * for). Pass `expectedKeys` when the dim's key count is known to skip
    * the sketch-sizing count pass. Verified by `q_bloom_prefilter_join`.
    */
  def bloomSemiJoin(
      fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      fpp: Double = 0.01, expectedKeys: Long = -1L): DataFrame =
    ops.PipelineOps.bloomSemiJoin(fact, factKey, dim, dimKey, fpp, expectedKeys)

  /** Okapi BM25 (k1=1.2, b=0.75) score of every document against a
    * fixed query-term set: one fused corpus pass; the whole model
    * state (N, Σdl, per-term doc frequency) is K+2 numbers and bakes
    * into the scoring expression, so the plan is JOIN-FREE at any
    * corpus size. EAGER ([[bigramLogProb]] discipline). Verified by
    * `q_bm25` (and fused into `q_hybrid_rrf`).
    */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String]): DataFrame =
    ops.PipelineOps.bm25Scores(docs, queryTerms)

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` terms (deterministic top-k by freq desc, word).
    * Verified by `q_oov_rate`.
    */
  def oovRate(docs: DataFrame, vocabSize: Int = 20): DataFrame =
    ops.PipelineOps.oovRate(docs, vocabSize)

  /** Global decile of `metricCol` per row (ties by `idCol`), computed
    * two-phase (value buckets + offsets) so no single-task window
    * appears at any corpus size. `bucketWidth` is the value-space
    * bucket size for the partial ranks. When the measured bucket count
    * is bounded the offsets ride a literal broadcast map (EAGER:
    * histogram collected at call time); past the cap the broadcast-
    * offsets join path takes over. Verified by `q_quality_deciles`.
    */
  def valueDeciles(
      df: DataFrame, metricCol: String, idCol: String,
      bucketWidth: Int, carryCols: Seq[String] = Nil,
      maxLiteralBuckets: Long = ops.PipelineOps.MaxLiteralDecileBuckets): DataFrame =
    ops.PipelineOps.valueDeciles(df, metricCol, idCol, bucketWidth, carryCols,
      maxLiteralBuckets)

  /** BPE merge training over (doc_id, text) rows: `rounds` most-frequent
    * adjacent-symbol merges, computed on the corpus's word-frequency
    * histogram (one corpus pass; every round is vocabulary-bounded).
    * Returns (round, pair, cnt). Verified by `q_bpe_merges`.
    */
  def bpeMerges(docs: DataFrame, rounds: Int = 3): DataFrame =
    ops.PipelineOps.bpeMerges(docs, rounds)

  /** BPE encode: apply the [[bpeMerges]]-trained merge list to every
    * word occurrence (one narrow literal-splice projection — the merge
    * list is collected model state, like the k-means centroids) and
    * report per-document (n_words, n_chars, n_tokens, compression).
    * Verified by `q_bpe_encode`.
    */
  def bpeEncode(docs: DataFrame, rounds: Int = 3): DataFrame =
    ops.PipelineOps.bpeEncode(docs, rounds)

  /** Exported tokenizer vocabulary (token_id, token, kind): chars in
    * code-point order, then merge products in training order — the
    * deterministic id table a training job loads to decode id shards.
    * Training is memoized per corpus plan (deterministic model state).
    * Verified by `q_bpe_vocab`.
    */
  def bpeVocab(docs: DataFrame, rounds: Int = 3): DataFrame =
    ops.TrainPrepOps.bpeVocabDf(docs, rounds)

  /** Token-id emission: (doc_id, source, ids array<int>) — every word
    * encoded through the trained merge list in one narrow codegen pass
    * (the tokenizer rides the expression as a reference object; no
    * join, no shuffle). Verified by `q_bpe_ids`.
    */
  def tokenIds(docs: DataFrame, rounds: Int = 3): DataFrame =
    ops.TrainPrepOps.tokenIds(docs, rounds)

  /** Pack token-id streams into fixed-`seqLen` training sequences per
    * shard (docs in doc_id order, EOD separator after each document;
    * documents span sequence boundaries) — the id-array sibling of
    * [[packSequences]], emitting the sequences themselves. Output:
    * (source, seq_no, ids array<int>). Verified by `q_tokenize_pack`
    * (which also writes/reads the id shards).
    */
  def packTokenIds(docs: DataFrame, rounds: Int = 3, seqLen: Int = 64): DataFrame =
    ops.TrainPrepOps.packTokenIds(docs, rounds, seqLen)

  /** Overlapping token-window chunking (RAG/embedding prep): `window`
    * tokens starting every `stride`, tail clamped — one narrow pass.
    * Output: (doc_id, chunk_id, start_token, n_chunk_tokens,
    * chunk_text). Verified by `q_chunk_windows`.
    */
  def chunkDocuments(docs: DataFrame, window: Int = 16, stride: Int = 8): DataFrame =
    ops.PipelineOps.chunkDocuments(docs, window, stride)

  /** Top-k adjacent-word collocations by pointwise mutual information
    * over (doc_id, text) rows, keeping pairs seen at least `minCount`
    * times. One corpus-scale partial aggregation; the w1/w2 margins are
    * keyed partial aggregations joined back and the grand total is a
    * one-row broadcast — nothing funnels through a single task at any
    * corpus size. Verified by `q_collocations`.
    */
  def collocations(docs: DataFrame, minCount: Long = 5, k: Int = 20): DataFrame =
    ops.PipelineOps.collocations(docs, minCount, k)

  /** Trained k-means codebook over (vec_id LONG, embedding ARRAY<FLOAT>)
    * rows: (k, carr ARRAY<DOUBLE>), possibly fewer than `k` rows (a
    * centroid losing every member is dropped — see MlOps). Assignment is
    * narrow (literal centroids in the projection, per-row fold); only
    * the (cluster, dim) mean update shuffles. Training verified by
    * `q_kmeans_embed`.
    */
  def kmeansCentroids(emb: DataFrame, k: Int = 4, iters: Int = 2): DataFrame =
    ops.MlOps.kmeansCentroids(emb, k, iters)

  /** The chained ANN pipeline: k-means-train the IVF coarse quantizer,
    * cell-assign the corpus (narrow), search each query's cell, and
    * report per-query recall@3 against the exact brute-force top-3.
    * Verified by `q_ann_ivf_trained`.
    */
  def annIvfTrainedRecall(emb: DataFrame, k: Int = 4, iters: Int = 2): DataFrame =
    ops.MlOps.ivfTrainedRecall(emb, k, iters)

  /** Multi-probe IVF recall: like [[annIvfTrainedRecall]] but each query
    * searches its `nprobe` nearest trained cells, reporting recall@3 at
    * nprobe=1 vs nprobe=`nprobe` side by side — the recall-vs-cost knob
    * a real IVF deployment tunes. Verified by `q_ann_ivf_nprobe`.
    */
  def annIvfProbeRecall(
      emb: DataFrame, k: Int = 4, iters: Int = 2, nprobe: Int = 2): DataFrame =
    ops.MlOps.ivfProbeRecall(emb, k, iters, nprobe)

  /** SemDeDup-style semantic dedup: k-means cells bound the candidate
    * pairs, and within each cell any vector with a smaller-id neighbor
    * at cosine ≥ `threshold` is marked duplicate. The pair join carries
    * int8-quantized vectors prefiltered at `threshold - prefilterSlack`
    * (the float cosine re-checks survivors, so the decision is exact;
    * QuantizedPrefilterSpec pins the slack headroom). The DEFAULT cell
    * count is DERIVED from a corpus-count probe
    * (K = clamp(ceil(N/256), 1, 4096)) so the O(N²/K) pair bound holds
    * at any corpus size; pass an explicit `k` to pin the codebook.
    * Output: one (vec_id, cell, is_dup) row per vector. Verified by
    * `q_semantic_dedup` (pinned k), `q_embed_dedup` and
    * `q_image_semdedup` (derived K at every SF).
    */
  def semanticDedup(
      emb: DataFrame, k: Int = ops.MlOps.AutoK, iters: Int = 2,
      threshold: Double = 0.42, prefilterSlack: Double = 0.08): DataFrame =
    ops.MlOps.semanticDedup(emb, k, iters, threshold, prefilterSlack)

  /** Quantized stored-index ANN search: probe the query's IVF cell with
    * int8 codes (4× less index traffic), rerank the top-`rerank`
    * shortlist in full precision, return the float-decided top-`topk`
    * per query — the memory-bound deployment path. Same output contract
    * as the full-precision stored-index search, so the two paths diff
    * row for row; `q_ann_ivf_i8` reports that diff as per-query
    * recall@3. Verified by `q_ann_ivf_i8`.
    */
  def searchAgainstIvfIndexI8(
      queries: DataFrame, codebook: DataFrame, indexI8: DataFrame,
      topk: Int = 3, rerank: Int = 10): DataFrame =
    ops.MlOps.searchAgainstIvfIndexI8(queries, codebook, indexI8, topk, rerank)

  /** Semantic eval-set decontamination from raw text: embeds both
    * frames, trains the cell codebook on the CORPUS only, and flags
    * every corpus document with a same-cell benchmark neighbor at
    * cosine ≥ `threshold` — the paraphrase-level sibling of the n-gram
    * [[contamination]]. Pairs are bounded by |benchmark| × cell size.
    * Output: (doc_id, n_hits, flagged) per corpus document. Verified by
    * `q_embed_contamination`.
    */
  def semanticContamination(
      corpus: DataFrame, benchmark: DataFrame,
      threshold: Double = 0.96, k: Int = 16): DataFrame =
    ops.MlOps.semanticContamination(corpus, benchmark, threshold, k)

  /** Hashed char-trigram document embedding: projects (doc_id, text)
    * rows to L2-normalized `dim`-component float vectors in ONE narrow
    * map-only pass (the corpus text never shuffles) — the text→vector
    * bridge that lets the similarity/ANN/SemDeDup stack run from raw
    * documents with no precomputed embedding table. Output:
    * (vec_id, embedding array<float>). Verified by `q_embed_from_text`;
    * chained end-to-end by `q_embed_dedup`.
    */
  def embedFromText(docs: DataFrame, dim: Int = ops.MlOps.EmbedDim): DataFrame =
    ops.MlOps.embedFromText(docs, dim)

  /** Image → embedding: decodes each (doc_id, content binary) row
    * through the real PNG/JPEG path, grayscales with Go parity, and
    * projects to an L2-normalized `hGrid`×`wGrid` block-intensity
    * vector (64 dims by default — the [[embedFromText]] dimension, so
    * image vectors ride the same ANN/SemDeDup machinery). Map-only:
    * image bytes never shuffle; undecodable rows yield NULL. Verified
    * by `q_image_embed`; chained end-to-end by `q_image_semdedup`.
    */
  def imageEmbed(images: DataFrame, wGrid: Int = 8, hGrid: Int = 8): DataFrame =
    ops.MlOps.imageEmbed(images, wGrid, hGrid)

  /** Audio → embedding: decodes each (doc_id, content binary) row
    * through the real `javax.sound.sampled` PCM16 WAV path and projects
    * to an L2-normalized vector of `bins` signed time-bin sample sums
    * (a coarse waveform envelope; 64 dims by default — the
    * [[embedFromText]] dimension, so audio vectors ride the same
    * ANN/SemDeDup machinery). Map-only: audio bytes never shuffle;
    * undecodable rows yield NULL. Verified by `q_audio_embed`; chained
    * end-to-end by `q_audio_semdedup`.
    */
  def audioEmbed(audio: DataFrame, bins: Int = ops.MlOps.EmbedDim): DataFrame =
    ops.MlOps.audioEmbed(audio, bins)

  /** Per-domain document cap — the crawl anti-flood rule: keep at most
    * `cap` rows per domain, preferring the highest score (ties →
    * smallest id). Pass a NARROW (id, domain, score, …stats) frame so
    * the ranking window never moves document payloads. Verified by
    * `q_domain_cap`.
    */
  def domainCap(docs: DataFrame, domainCol: String, scoreCol: String,
      idCol: String, cap: Int): DataFrame =
    ops.TrainPrepOps.domainCap(docs, domainCol, scoreCol, idCol, cap)

  /** Budget-driven source mixing: deterministically hash-downsample
    * each (doc_id, text, source) source toward `targetTokens`, deriving
    * the per-source keep rate from the data inside the plan (tiny
    * per-source aggregate broadcast back; two narrow corpus passes).
    * Output per source: totals, applied rate, kept doc/token counts.
    * Verified by `q_source_mix`.
    */
  def sourceMix(docs: DataFrame, targetTokens: Long): DataFrame =
    ops.PipelineOps.sourceMix(docs, targetTokens)

  /** Domain-weighted mixture: per-source token target is
    * weight(source) × totalBudget (sources absent from the map are
    * excluded), keep rates derived in-plan as in [[sourceMix]]. Output
    * adds the applied `weight` column. Verified by
    * `q_source_mix_weighted`.
    */
  def sourceMixWeighted(
      docs: DataFrame, weights: Map[String, Double], totalBudget: Long): DataFrame =
    ops.PipelineOps.sourceMixWeighted(docs, weights, totalBudget)

  /** Temperature-flattened mixture: per-source weights proportional to
    * token-share^alpha (uniform as alpha→0, natural at 1 — the small-
    * domain upweighting schedule of pretraining mixes), keep rates
    * derived in-plan as in [[sourceMix]]. alpha = 0.5 is the
    * cross-engine-deterministic path (sqrt, not libm pow). Verified by
    * `q_source_mix_temperature`.
    */
  def sourceMixTemperature(
      docs: DataFrame, alpha: Double, totalBudget: Long): DataFrame =
    ops.PipelineOps.sourceMixTemperature(docs, alpha, totalBudget)

  /** Cross-document repeated `n`-token spans (boilerplate/template
    * detection, the signal behind exact-substring dedup): top `k` spans
    * by occurrence appearing in >= `minDocs` distinct docs. One explode
    * + one span-keyed aggregation. Verified by `q_repeated_spans`.
    */
  def repeatedSpans(
      docs: DataFrame, n: Int = 8, minDocs: Long = 2, k: Int = 20): DataFrame =
    ops.PipelineOps.repeatedSpans(docs, n, minDocs, k)

  /** Benchmark decontamination check: for each (doc_id, text) corpus
    * row, the count and fraction of its distinct 3-gram shingles that
    * appear anywhere in `benchmark` (also (doc_id, text) rows). The
    * benchmark shingle set is broadcast; the corpus is exploded once —
    * one broadcast join + one aggregation keyed by doc_id. Output:
    * (doc_id, n_shingles, n_hit, frac). Verified by `q_contamination`.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame): DataFrame =
    ops.PipelineOps.contaminationCheck(corpus, benchmark)

  /** Latest-wins incremental merge (lakehouse upsert): union `base` and
    * `delta`, keep per `keyCol` the row greatest by `orderCols`
    * (compared in order, descending). Pass `rowIdCol` — a globally
    * unique tiebreaker that appears in `orderCols` (the precombine-key
    * contract) — to get the SORT-FREE spelling: a narrow keeper
    * aggregation + hinted shuffled-hash semi join, so the row payload
    * is never sorted (see [[dedupExact]] — same discipline, keep-last).
    * Without it, the row_number window spelling handles non-total
    * orders (one arbitrary winner under ties) at the cost of a payload
    * sort. Verified by `q_upsert_latest`.
    */
  def mergeLatest(
      base: DataFrame, delta: DataFrame, keyCol: String,
      orderCols: Seq[String], rowIdCol: Option[String] = None): DataFrame =
    ops.PipelineOps.mergeLatest(base, delta, keyCol, orderCols, rowIdCol)

  /** Per-document average bigram log-probability under the corpus's own
    * MLE bigram model (perplexity-style quality score). Two corpus
    * passes; the probability table is vocabulary-bounded and broadcast.
    * Verified by `q_bigram_lm`.
    */
  def bigramLogProb(docs: DataFrame): DataFrame =
    ops.PipelineOps.bigramLogProb(docs)

  /** Corpus curation — the verified recipe of `q_corpus_curation`:
    * quality-gate (≥ `minTokens` words AND, when `requireStopwordSignal`,
    * ≥ 1 English stopword — the cheap fluency signal), then fingerprint
    * dedup keeping the smallest `idCol`. One narrow pass + one shuffle.
    * Output = kept input rows + an `n_tokens` LONG column (the one
    * added/overwritten column; internals are collision-safe).
    */
  def curate(
      docs: DataFrame, minTokens: Int = 10,
      requireStopwordSignal: Boolean = true,
      idCol: String = "doc_id"): DataFrame = {
    // token count + stopword signal from ONE fused codegen pass (the
    // gate only tests PRESENCE, so GopherStats' distinct-stopword count
    // and the per-token filter count agree on `> 0` by construction;
    // the interpreted per-token isInCollection lambda this replaces was
    // the measured bulk of q_corpus_curation's scan job)
    val st = functions.GraftFunctions.gopher_stats(col("text"))
    val scored = docs
      .withColumn("n_tokens", st.getField("n_words"))
      .withColumn("__graft_stop", st.getField("n_stop"))
      .withColumn("__graft_fp", fingerprint(col("text")))
    val gated = scored
      .filter(col("n_tokens") >= minTokens)
      .filter(!lit(requireStopwordSignal) || col("__graft_stop") > 0)
    // idCol is the caller's unique row id, so the semi join probes on
    // it alone — the probe side's fingerprint regex is pruned away
    dedupExact(gated, "__graft_fp", idCol, orderUnique = true)
      .drop("__graft_fp", "__graft_stop")
  }

  /** PII detection + redaction over `textCol`: adds per-row
    * `n_emails`/`n_ips`/`n_phones` match counts and a `scrubbed` copy
    * (emails → `[EMAIL]`, IPv4 → `[IP]`, phones → `[PHONE]`, fixed
    * order). Fully narrow. Verified by `q_pii_scrub`.
    */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame =
    ops.CurationOps.piiScrub(df, textCol)

  /** Paragraph (line-level) dedup statistics per document — the
    * CCNet/Dolma boilerplate-drop stage: (doc_id, n_lines, n_dup_lines,
    * dup_frac, keep). One digest-keyed exchange (16-byte md5, line text
    * never shuffles) + one doc-keyed aggregation. Verified by
    * `q_line_dedup`.
    */
  def lineDupStats(
      docs: DataFrame, lineTokens: Int = 3,
      maxDupFrac: Double = 0.5): DataFrame =
    ops.CurationOps.lineDupStats(docs, lineTokens, maxDupFrac)

  /** Per-domain URL frequency over `textCol`: (domain, n_urls, n_docs)
    * — the allowlist/blocklist table. Narrow explode + one domain-keyed
    * aggregation. Verified by `q_url_extract`.
    */
  def urlDomains(df: DataFrame, textCol: String = "text"): DataFrame =
    ops.CurationOps.urlDomains(df, textCol)

  /** Hashed-feature linear quality classifier (fastText inference
    * shape): per document (doc_id, n_words, wsum, score, prob, label).
    * Exact integer weight sums via ONE fused codegen pass; no hash
    * shuffle — the only exchange is the doc_id range partition the
    * presentation sort rides (input range-exchanged first so the sort
    * samples only the scan). Verified by `q_quality_classifier`.
    */
  def hashedQuality(docs: DataFrame): DataFrame =
    ops.CurationOps.hashedQuality(docs)

  /** DSIR-style hashed importance weighting for target-domain data
    * selection: per document (doc_id, n_words, wsum, avg_ratio, keep),
    * where `avg_ratio` is the mean hashed-unigram target/raw
    * probability ratio and `keep` marks documents more target-like
    * than average. One corpus histogram pass; the 64-bucket ratio
    * table is collected model state baked into the fused scoring
    * expression. No hash shuffle — the scoring pass's only exchange is
    * the doc_id range partition its presentation sort rides. Eager at
    * construction. Verified by `q_dsir_weights`.
    */
  def dsirWeights(docs: DataFrame, targetSources: Seq[String]): DataFrame =
    ops.CurationOps.dsirWeights(docs, targetSources)

  /** Gopher quality-rule battery (Rae et al. 2021 §A1.1) over a text
    * column: word-count bounds, mean word length, alphabetic-word
    * ratio, required stopwords, symbol ratio, bullet/ellipsis line
    * ratios — every rule an exact integer comparison, raw counts kept
    * in the output. Fully narrow, no presentation sort — applies to an
    * unbounded stream unchanged (StreamingSpec). Verified by
    * `q_gopher_rules`.
    */
  def gopherRules(
      df: DataFrame, textCol: String = "text",
      minWords: Long = 50, maxWords: Long = 100000): DataFrame =
    ops.FilterOps.gopherRules(df, textCol, minWords, maxWords)

  /** C4-style line cleaning (Raffel et al. 2020 §2.2): keep lines
    * ending in terminal punctuation with >= `minLineWords` words; flag
    * documents with code braces or placeholder text. Output: (doc_id,
    * n_lines, n_kept, kept_frac, keep, cleaned). Fully narrow, no
    * presentation sort — stream-applicable (StreamingSpec). Verified
    * by `q_c4_clean`.
    */
  def c4Clean(
      df: DataFrame, textCol: String = "text",
      minLineWords: Int = 3): DataFrame =
    ops.FilterOps.c4Clean(df, textCol, minLineWords)

  /** Corpus-frequency boilerplate stripping: remove every line
    * occurring in >= `minDocs` distinct documents and rebuild each
    * document in order. Digest-keyed frequency exchange (16 bytes),
    * size-honest broadcast flag join, one doc-keyed rebuild
    * aggregation. Verified by `q_boilerplate_strip`.
    */
  def boilerplateStrip(
      docs: DataFrame, lineTokens: Int = 4, minDocs: Int = 2): DataFrame =
    ops.FilterOps.boilerplateStrip(docs, lineTokens, minDocs)

  /** Global first-occurrence line dedup: remove every occurrence of a
    * duplicated line except the corpus-wide first (by (doc_id, pos))
    * and rebuild each document in order — the CCNet/RefinedWeb "keep
    * one copy" rewrite, [[boilerplateStrip]]'s positional sibling.
    * Digest-keyed winner exchange, size-honest broadcast winner map or
    * flag join, one doc-keyed rebuild. Verified by
    * `q_line_dedup_rebuild`.
    */
  def firstLineDedup(docs: DataFrame, lineTokens: Int = 4): DataFrame =
    ops.FilterOps.firstLineDedup(docs, lineTokens)

  /** Arbitrary-length exact-substring dedup (the deduplicate-text-
    * datasets ExactSubstr discipline at word-token granularity): every
    * substring of >= `k` tokens occurring more than once in the corpus
    * is removed from every document, documents rebuilt from surviving
    * tokens (untouched docs keep their original text byte-for-byte).
    * Digest-count exchange of 8-byte rolling hashes, size-honest
    * broadcast digest set (fused one-pass strip) or digest-keyed join.
    * Output: (doc_id, n_tokens, n_removed, cleaned). Verified by
    * `q_substring_dedup`.
    */
  def substringDedup(docs: DataFrame, k: Int = 8): DataFrame =
    ops.DedupOps.substringDedup(docs, k)

  /** CCNet perplexity gate: bigram-LM score per document, two-phase
    * decile, keep documents at or above `keepFromDecile`. Output:
    * (doc_id, n_bigrams, avg_logprob, decile, keep). Inherits
    * [[bigramLogProb]] eagerness. Verified by `q_perplexity_filter`.
    */
  def perplexityFilter(docs: DataFrame, keepFromDecile: Int = 4): DataFrame =
    ops.FilterOps.perplexityFilter(docs, keepFromDecile)

  /** TRAIN a hashed linear quality classifier on weak source labels
    * (batch perceptron, pure integer arithmetic) and score the corpus —
    * the training half of the fastText-classifier recipe behind
    * CCNet/FineWeb quality filters. Output: (doc_id, label, n_words,
    * score, pred, correct). Verified by `q_quality_train`.
    */
  def perceptronQuality(
      docs: DataFrame, targetSources: Seq[String], rounds: Int = 3): DataFrame =
    ops.CurationOps.perceptronQuality(docs, targetSources, rounds)

  /** Threshold-calibration table over [[perceptronQuality]]'s scores:
    * 10 integer value-grid thresholds, per-threshold tp/fp/fn +
    * precision/recall/F1, and the F1-argmax operating point — the
    * table a curation team reads before deploying the trained gate.
    * Verified by `q_quality_eval`.
    */
  def qualityEval(
      docs: DataFrame, targetSources: Seq[String], rounds: Int = 3): DataFrame =
    ops.CurationOps.qualityEval(docs, targetSources, rounds)

  /** Stored-LSH-index rows for a (doc_id, text) frame — build once over
    * the corpus, append each admitted snapshot, probe at admission time.
    * See [[ops.DedupOps.lshIndex]]; drives [[admitAgainstIndex]].
    */
  def lshIndex(docs: DataFrame): DataFrame = ops.DedupOps.lshIndex(docs)

  /** Per-batch incremental admission: drop every doc in `newDocs` that
    * near-duplicates an indexed doc (band collision + signature
    * agreement), keep the rest. The streaming admission loop calls this
    * per micro-batch and appends `lshIndex(admitted)` to the index.
    * Verified by `q_dedup_incremental` (bulk form) and the
    * StreamingSpec admission loop.
    */
  def admitAgainstIndex(newDocs: DataFrame, index: DataFrame): DataFrame =
    ops.DedupOps.admitAgainstIndex(newDocs, index)

  /** Stored IVF index rows (vec_id, cell, embedding) for a vector frame
    * against a stored (k, carr) codebook — build once, append admitted
    * batches, probe cell-keyed at search time. See
    * [[ops.MlOps.ivfIndex]]; drives [[searchAgainstIvfIndex]].
    */
  def ivfIndex(emb: DataFrame, codebook: DataFrame): DataFrame =
    ops.MlOps.ivfIndex(emb, codebook)

  /** Per-batch cell-probed ANN search against a stored IVF index — the
    * similarity side's [[admitAgainstIndex]]: each query scores only
    * its own cell's index rows, bounded top-k per query. The streaming
    * loop calls this per micro-batch, appends `ivfIndex(batch,
    * codebook)`, and retrains-and-swaps the codebook on drift
    * (StreamingSpec drives all three). Output: (qid, cell, vid, sim).
    */
  def searchAgainstIvfIndex(
      queries: DataFrame, codebook: DataFrame, index: DataFrame,
      topk: Int = 3): DataFrame =
    ops.MlOps.searchAgainstIvfIndex(queries, codebook, index, topk)

  /** URL blocklist gate: status = blocked_domain (exact host or
    * dot-suffix subdomain of a blocked registered domain) |
    * blocked_path (path contains `blockedPathSeg`) | kept. One narrow
    * codegen pass; stream-applicable. Verified by `q_url_blocklist`.
    */
  def urlBlocklistGate(df: DataFrame, urlCol: String,
      blockedDomains: Seq[String], blockedPathSeg: String): DataFrame =
    ops.CurationOps.urlBlocklistGate(df, urlCol, blockedDomains, blockedPathSeg)

  /** Typographic/control-character normalization (the pre-fingerprint
    * cleanup pass): curly quotes, dashes, ellipsis, NBSP, control
    * chars, whitespace runs. Idempotent; stream-applicable. Verified by
    * `q_text_normalize`.
    */
  def normalizeText(c: Column): Column = ops.CurationOps.normalizeText(c)

  /** HTML → text extraction in one codegen pass:
    * struct<text, main_text, n_lines, n_kept> — stage-1 extracted
    * lines and the link-density-gated main content (the crawl step
    * between HTTP decode and every text operator). Rule chain +
    * engine-exactness contract on [[graft.functions.HtmlTextUtil]];
    * verified by `q_html_extract` (chain oracle) and `q_html_main`
    * (independent closed-form oracle).
    */
  def htmlExtract(html: Column): Column =
    graft.functions.GraftFunctions.html_extract(html)

  /** The main-content text alone (extraction + boilerplate gate). */
  def htmlMainText(html: Column): Column =
    graft.functions.GraftFunctions.html_extract(html).getField("main_text")

  /** Per-line extraction evidence: array<struct<line, n_chars,
    * n_link_chars>> — the density numbers behind the main-content
    * gate, for threshold debugging. Verified by `q_html_density`.
    */
  def htmlLineStats(html: Column): Column =
    graft.functions.GraftFunctions.html_lines(html)

  /** Write a WET-shaped (`conversion`-record) corpus — the
    * extracted-text sibling of a response archive; see
    * `ArchiveOps.writeWetCorpus`. Verified by `q_warc_wet` and the
    * `q_wet_refine` refinery roundtrip.
    */
  def writeWetCorpus(docs: DataFrame, dir: String, shards: Int): Unit =
    ops.ArchiveOps.writeWetCorpus(docs, dir, shards)

  /** Write a real-crawl-shaped corpus: request/response/metadata trios
    * (WARC-Concurrent-To links) plus identical-payload-digest `revisit`
    * records for every doc_id % 7 == 3. Verified by `q_warc_trio` and
    * `q_warc_revisit` (+ the revisit-policy spec in WarcDsv2Spec).
    */
  def writeCrawlTrioCorpus(docs: DataFrame, dir: String, shards: Int): Unit =
    ops.ArchiveOps.writeCrawlTrioCorpus(docs, dir, shards)

  /** Snapshot-over-snapshot crawl update: URL canonicalization →
    * canonical-URL exact dedup vs the previous snapshot → MinHash-LSH
    * near-dup admission (same-URL matches excluded) → per-source delta
    * accounting. Inputs: (doc_id, source, url, text). Verified by
    * `q_crawl_update`.
    */
  def crawlUpdate(prev: DataFrame, next: DataFrame): DataFrame =
    ops.DedupOps.crawlUpdate(prev, next)

  /** Train the hashed char-n-gram language classifier (fastText
    * inference shape) on labeled (lang, text) rows: per-language
    * 4096-bucket histograms over char 1+2+3-grams, integer
    * micro-frequency weights. Verified by `q_lang_id_hashed` +
    * LangIdSpec's real-multilingual accuracy demonstration.
    */
  def trainLangIdModel(labeled: DataFrame): Seq[(String, Seq[Long])] =
    ops.TextOps.trainLangIdModel(labeled)

  /** Score (doc_id, lang, text) rows against a [[trainLangIdModel]]
    * model: one md5 per n-gram across all classes, integer argmax.
    * Output: (doc_id, lang, predicted, best_score).
    */
  def langIdScore(docs: DataFrame, model: Seq[(String, Seq[Long])]): DataFrame =
    ops.TextOps.langIdScore(docs, model)

  /** Train/val split leakage audit over a deterministic 25% md5
    * holdout: per source, how many val docs near-duplicate a train doc
    * (band collision + signature agreement). Verified by
    * `q_split_leakage`.
    */
  def splitLeakage(docs: DataFrame): DataFrame = ops.DedupOps.splitLeakage(docs)

  /** Corpus snapshot diff (dataset-versioning audit): per source, docs
    * added/removed/changed/same between v1 and v2 by whitespace-
    * normalized fingerprint, plus the net token delta. One doc_id-keyed
    * full-outer join over ~50-byte projected rows. Verified by
    * `q_corpus_diff`.
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame =
    ops.CurationOps.corpusDiff(v1, v2)

  /** WARC (ISO 28500) corpus export: sharded `.warc`/`.warc.gz`/
    * `.warc.zst` files (member-per-record compression, the
    * crawl-archive layouts). Verified by
    * `q_warc_roundtrip`. The indexed variant also returns the
    * CDX-style record index (persist it next to the archive); serve
    * individual records from it with [[fetchWarcRecords]]
    * (`q_warc_fetch`). Read back in bulk with [[readWarc]], or through
    * `spark.read.format("warc")` for pruned/filter-pushed scans
    * (`q_warc_pushdown`) — which also parses real-crawl HTTP `response`
    * records into `http_status`/`content_type`/charset-decoded `text`
    * (`q_warc_http`) and plans index-SEEK partitions over a `_cdx`
    * sidecar for record_id-pinned reads; tail a landing directory with
    * `readStream.format("warc")` (`ops.ArchiveOps.streamCorpus`).
    */
  def writeWarc(docs: DataFrame, dir: String, shards: Int): Unit =
    ops.ArchiveOps.writeCorpus(docs, dir, shards)

  def writeWarcIndexed(docs: DataFrame, dir: String, shards: Int): Dataset[ops.WarcIndexRow] =
    ops.ArchiveOps.writeIndexedCorpus(docs, dir, shards)

  def readWarc(spark: SparkSession, dir: String): DataFrame =
    ops.ArchiveOps.readCorpus(spark, dir)

  def fetchWarcRecords(index: DataFrame): DataFrame =
    ops.ArchiveOps.fetchRecords(index)

  /** Avro object-container corpus export/ingest (schema embedded per
    * file; deflate blocks). Verified by `q_avro_roundtrip`.
    */
  def writeAvro(docs: DataFrame, dir: String, shards: Int): Unit =
    ops.ArchiveOps.writeAvroCorpus(docs, dir, shards)

  def readAvro(spark: SparkSession, dir: String): DataFrame =
    ops.ArchiveOps.readAvroCorpus(spark, dir)
}
