package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

import Present._

/** Training-data pipeline operators beyond the dedup/similarity suite
  * (SURVEY.md §2C): repetition-based quality signals, sequence packing,
  * inverted-index construction, deterministic stratified sampling, a
  * Bloom runtime-filter join, and bigram language-model scoring. The
  * registered queries route through the public functions here (exposed on
  * [[graft.GraftOps]]), so the DuckDB gate verifies the library surface.
  *
  * Scale posture (100 TB):
  *  - repetition signals and stratified sampling are NARROW per-row
  *    computations (higher-order array functions / a hash compare) — zero
  *    shuffle, fully codegen-friendly, and the sampling predicate is a
  *    plain filter the optimizer can push around freely;
  *  - sequence packing shuffles once, keyed by the shard column —
  *    exactly the per-shard parallel packing a real corpus run uses
  *    (shards at 100 TB number in the thousands, so the window
  *    partitions are balanced and plentiful);
  *  - the inverted index aggregates (term, doc) with map-side combine and
  *    caps posting lists BEFORE collecting (row_number pre-filter rides
  *    the same exchange), so a stop-word term can never build an
  *    O(corpus) array in one row;
  *  - the Bloom join moves only a ~KB sketch through the driver and cuts
  *    fact rows before the join exchange (the manual form of Spark's
  *    runtime bloom-filter rewrite);
  *  - bigram LM scoring is two corpus passes with a vocabulary-bounded
  *    broadcast probability table.
  */
object PipelineOps extends QueryModule {

  import TextOps.{WordsSql, words}

  /** Token budget per packed training sequence. */
  val SeqTokenBudget = 512

  /** Posting-list cap: keep the first K doc_ids per term. */
  val PostingCap = 20

  // --------------------------------------------------------------------
  // Public operator functions (surfaced on GraftOps; see Scaladoc there)
  // --------------------------------------------------------------------

  def repetitionSignals(docs: DataFrame): DataFrame = {
    val st = col("st")
    // One fused native hash-pass per document (RepetitionStats) instead
    // of the composable-builtins spelling: array_max over
    // transform(array_distinct, filter) is O(distinct · n) STRING
    // comparisons through interpreted higher-order lambdas
    // (CodegenFallback) — measured as the entire cost of
    // q_repetition_signals at sf0.1. The expression returns exact
    // integer counts; the fraction arithmetic below keeps the previous
    // cast/division spelling, so every derived double is bit-identical
    // to the old plan and to the oracle. Downstream filters on the
    // signals (the e2e composite's quality gate) push below the
    // projection with the alias inlined — each inlined copy is one
    // O(tokens) codegen'd pass, and codegen subexpression elimination
    // dedups repeated copies within a stage.
    docs
      .filter(TextOps.wordCount(col("text")) >= 2)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.repetition_stats(
          words(col("text"))).as("st"))
      .select(
        col("doc_id"),
        st.getField("n_tokens").as("n_tokens"),
        (st.getField("max_unigram").cast("double")
          / st.getField("n_tokens")).as("top_unigram_frac"),
        (lit(1.0) - st.getField("distinct_bigrams").cast("double")
          / st.getField("n_bigrams")).as("dup_bigram_frac"),
        (st.getField("sum_word_len").cast("double")
          / st.getField("n_tokens")).as("mean_word_len"))
  }

  def packSequences(
      docs: DataFrame, shardCol: String, idCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", TextOps.wordCount(col("text")))
      .filter(col("n_tokens") > 0)
      .withColumn("__graft_cum", sum(col("n_tokens")).over(w))
      .withColumn("start_seq",
        ((col("__graft_cum") - col("n_tokens")) / budget).cast("long"))
      .withColumn("end_seq", ((col("__graft_cum") - 1) / budget).cast("long"))
      .withColumn("n_seqs", col("end_seq") - col("start_seq") + 1)
      .drop("__graft_cum")
  }

  def invertedIndex(docs: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy("term").orderBy("doc_id")
    docs
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
            sort_array(collect_list(when(col("rn") <= cap, col("doc_id")))),
            x => x.cast("string")),
          ",").as("posting"))
  }

  def hashSample(
      df: DataFrame, idCol: String, strataCol: String,
      thresholds: Map[String, String], defaultThreshold: String,
      hashCol: String = "h"): DataFrame = {
    val h = substring(md5(col(idCol).cast("string").cast("binary")), 1, 8)
    val thr = thresholds.foldLeft(when(lit(false), lit(""))) {
      case (acc, (stratum, t)) => acc.when(col(strataCol) === stratum, t)
    }.otherwise(defaultThreshold)
    // hashCol is part of the output contract (callers keep it as the
    // sampling audit column); the name is a parameter so a caller whose
    // frame already uses it can avoid the replacement.
    df.withColumn(hashCol, h).filter(col(hashCol) < thr)
  }

  def bloomSemiJoin(
      fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      fpp: Double, expectedKeys: Long = -1L): DataFrame = {
    val keys = dim.select(col(dimKey))
    // size the sketch from the caller's estimate when given; otherwise a
    // dim-sized scalar count job (not a data collect)
    val nKeys = if (expectedKeys > 0) expectedKeys else math.max(keys.count(), 1000L)
    val bf = keys.stat.bloomFilter(dimKey, nKeys, fpp)
    // the probe rides a codegen expression over an executor broadcast —
    // a ScalaUDF here broke whole-stage codegen at the fact scan and
    // boxed every key, and an expression-held sketch would deserialize
    // per task instead of once per executor
    val bfBc = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = org.apache.spark.sql.GraftBridge.column(
      graft.functions.BloomContains(
        org.apache.spark.sql.GraftBridge.expression(col(factKey)), bfBc))
    // no broadcast hint: the prefilter exists precisely for dims that may
    // outgrow broadcast range, so the join strategy is the planner's call
    // (AQE broadcasts small dims on its own)
    fact
      .filter(mightContain)
      .join(keys, col(factKey) === col(dimKey), "left_semi")
  }

  /** Exploded (doc_id, w1, w2) adjacent-bigram rows (shared by the LM
    * scoring and collocation queries).
    */
  private[ops] def docBigrams(docs: DataFrame): DataFrame = docs
    .filter(TextOps.wordCount(col("text")) >= 2)
    .select(col("doc_id"), explode(TextOps.shingles(col("text"), 2)).as("bg"))
    // tokens are maximal non-whitespace runs, so the single ' ' the
    // shingler inserted is the only space in the bigram string
    .select(col("doc_id"),
      substring_index(col("bg"), " ", 1).as("w1"),
      substring_index(col("bg"), " ", -1).as("w2"))

  /** Bigram-type count above which the probability-table broadcast hint
    * is dropped and the join strategy becomes the planner's call. A
    * forced `broadcast()` hint never degrades on its own — Spark
    * attempts the build at ANY size, and the job dies at exactly the
    * scale this engine targets (open-web bigram types run to billions).
    * 10M types × ~40 B/row ≈ 400 MB build side — the practical ceiling
    * for a comfortable executor broadcast.
    */
  private[ops] val MaxBroadcastBigramTypes = 10000000L

  /** Type-count ceiling for the literal hash-map LM path (shared with
    * [[TrainPrepOps.MaxLiteralLmTypes]]): under it, a bounded collect
    * turns the LM into one executor-broadcast map probed by a narrow
    * codegen expression — no join, no broadcast-build jobs; past it
    * the LM stays a distributed table. ~100 B/entry in a java HashMap:
    * 2M types ≈ 200 MB of driver/executor heap.
    */
  val MaxLiteralLmTypes = 2000000L

  /** NOTE: the size gates make this function EAGER — the bigram
    * materialization and the model-size probe run at call time, not at
    * the first action on the returned frame, because the physical-path
    * decision needs the measured count before the plan exists. Callers
    * composing lazy pipelines should call it once and reuse the result.
    */
  def bigramLogProb(
      docs: DataFrame,
      maxBroadcastTypes: Long = MaxBroadcastBigramTypes,
      maxLiteralTypes: Long = MaxLiteralLmTypes): DataFrame = {
    // Tokenize once and cut lineage: both the count pass and the
    // scoring pass read the materialized bigrams instead of re-running
    // the scan + shingle (same executor-local materialization the
    // clustering loop uses; at 100 TB this is the "tokenize once, reuse"
    // discipline every multi-pass corpus job needs). Kept as PER-DOC
    // ARRAYS of raw space-joined bigram strings (r13; previously one
    // exploded row per bigram occurrence): the literal scoring path
    // reads each doc's array in one LmArrayScore probe loop — no
    // explode, no doc_id-keyed exchange, no re-aggregation — and the
    // count/distributed passes explode on read, which costs what the
    // exploded checkpoint cost without storing doc_id per occurrence.
    val perDocPlan = docs
      .filter(TextOps.wordCount(col("text")) >= 2)
      .select(col("doc_id"), TextOps.shingles(col("text"), 2).as("bgs"))
    // Literal-first (the trigramBackoffLm discipline): the bigram TYPE
    // TABLE rides the checkpoint job itself as a capped observe metric
    // (ElemCountMapAgg; overflow past the cap → null → distributed
    // path), so the whole LM training phase is ONE job. Under the cap
    // the MLE derivation runs in the driver (conditioning totals are
    // hash-map sums over the counted types) as the exact scalar mirror
    // of [[lmFromCounts]], and scoring probes ONE broadcast hash map
    // from a narrow codegen expression — no counts collect job, no
    // counts checkpoint, no probability-table join.
    val literalCapped = maxLiteralTypes > 0 && maxLiteralTypes <= Int.MaxValue - 2
    val (bgDocs, typeCounts) =
      if (literalCapped) {
        val (cp, row) = TinyLoop.corpusCheckpointObserved(perDocPlan,
          Seq(graft.functions.GraftFunctions.elem_counts(
            col("bgs"), maxLiteralTypes.toInt)))
        (cp, if (row.isNullAt(0)) None else Some(row.getMap[String, Long](0)))
      } else (TinyLoop.corpusCheckpoint(perDocPlan), None)
    val bgRows = bgDocs.select(col("doc_id"), explode(col("bgs")).as("bg"))
    if (typeCounts.isDefined) {
      val counts = typeCounts.get
      val cu = new java.util.HashMap[String, java.lang.Long](counts.size * 2)
      counts.foreach { case (bg, c) =>
        val w1 = bg.substring(0, bg.indexOf(' '))
        val prev = cu.get(w1)
        cu.put(w1, (if (prev == null) 0L else prev.longValue) + c)
      }
      def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
      val hm = new java.util.HashMap[String, java.lang.Double](counts.size * 2)
      counts.foreach { case (bg, c) =>
        val tot = cu.get(bg.substring(0, bg.indexOf(' '))).longValue
        hm.put(bg, r6(math.log(c.toDouble / tot.toDouble)))
      }
      val bc = docs.sparkSession.sparkContext.broadcast(new graft.functions.LmMap(hm))
      // one LmArrayScore probe loop per document: count + exact-decimal
      // average of the KNOWN bigrams (null = zero known → doc dropped,
      // the exploded spelling's inner-join semantics; self-scoring
      // knows every bigram, so nothing drops here). Bit-identical to
      // round6(dsum(MapLp(bg))/count) over exploded rows — the
      // exactness contract is spelled out on LmMapUtil.scoreArray and
      // pinned by the StreamingSpec dual-path parity.
      return bgDocs.select(col("doc_id"),
        org.apache.spark.sql.GraftBridge.column(graft.functions.LmArrayScore(
          org.apache.spark.sql.GraftBridge.expression(col("bgs")), bc)).as("s"))
        .filter(col("s").isNotNull)
        .select(col("doc_id"),
          col("s").getField("n_bigrams").as("n_bigrams"),
          col("s").getField("avg_logprob").as("avg_logprob"))
    }
    // Distributed path (type table past the literal cap): conditioning
    // totals as a keyed partial aggregation joined back (NOT a per-w1
    // window: a stopword w1 pairs with most of the vocabulary, and a
    // window sorts that whole partition in one task — the aggregation
    // form partial-combines map-side and never builds the skewed
    // partition). Each ln term is rounded to 6 decimals (absorbs
    // per-ulp libm differences vs the oracle), then summed exactly in
    // decimal. The type table is materialized so the size gate's
    // count() reads it back instead of re-aggregating; scoring joins
    // it by broadcast when — and ONLY when — the measured type count
    // fits broadcast range (the corpus-scale side then streams with NO
    // re-shuffle), keyed past the gate: open-web bigram types run to
    // billions and a forced broadcast would die exactly there.
    val docBg = bgRows.select(col("doc_id"),
      substring_index(col("bg"), " ", 1).as("w1"),
      substring_index(col("bg"), " ", -1).as("w2"))
    val counts = docBg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val probs = lmFromCounts(counts)
    val probsSide = if (counts.count() <= maxBroadcastTypes) broadcast(probs) else probs
    avgLogProbAgg(docBg.join(probsSide, Seq("w1", "w2")))
  }

  /** MLE conditional probabilities from a (w1, w2, c) bigram-count
    * table — the one derivation shared by the batch scorer and the
    * streaming LM trainer, so the two paths cannot round differently.
    */
  private def lmFromCounts(counts: DataFrame): DataFrame = {
    val cond = counts.groupBy(col("w1").as("cw")).agg(sum(col("c")).as("cu"))
    counts
      .join(cond, col("w1") === col("cw"))
      .select(col("w1"), col("w2"),
        Exact.round6(log(col("c").cast("double") / col("cu"))).as("lp"))
  }

  private def avgLogProbAgg(scoredBigrams: DataFrame): DataFrame =
    scoredBigrams
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        Exact.round6(Exact.dsum(col("lp")) / count(lit(1))).as("avg_logprob"))

  /** The trained bigram LM as reusable MODEL STATE: (w1, w2, lp) with
    * lp = round6(ln(c(w1,w2) / c(w1·))) — exactly the probability table
    * [[bigramLogProb]] derives internally, exposed so it can be trained
    * on a REFERENCE corpus and handed to [[scoreBigramLm]] (the
    * streaming perplexity gate's scoring step). Vocabulary-bounded
    * (bigram types), never corpus-row-bounded.
    */
  def bigramLmTable(docs: DataFrame): DataFrame =
    lmFromCounts(docBigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("c")))

  /** Score (doc_id, text) rows against an already-trained
    * [[bigramLmTable]]: per-document n_bigrams + avg_logprob over the
    * bigrams the LM KNOWS. Unknown bigrams are skipped and a document
    * with ZERO known bigrams yields no row — route such no-signal docs
    * by explicit policy at the call site (drop, or admit with a
    * sentinel), exactly the decision a production CCNet gate makes for
    * out-of-domain text. Rounding discipline is shared with
    * [[bigramLogProb]], so scoring a corpus against its own LM table
    * reproduces bigramLogProb bit-for-bit (pinned by StreamingSpec).
    *
    * STATELESS given the LM table (one narrow explode + a broadcast
    * join + one doc-keyed aggregation), which is what makes it the
    * foreachBatch scoring step of the STREAMING perplexity gate — see
    * [[FilterOps.perplexityFilter]]'s scaladoc for the full recipe.
    * The LM is broadcast unconditionally: it is trained model state
    * the caller already sized (the batch path's size gate exists for
    * SELF-scoring, where the table is derived, not chosen).
    */
  def scoreBigramLm(docs: DataFrame, lm: DataFrame): DataFrame =
    avgLogProbAgg(docBigrams(docs).join(broadcast(lm), Seq("w1", "w2")))

  def collocations(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    // One corpus pass builds the bigram-type count table; checkpoint it so
    // the margin/total passes below reread the materialized counts instead
    // of re-running the scan + explode. At web scale distinct bigram TYPES
    // run to billions, so nothing here may funnel through one task: the
    // w1/w2 margins are partial aggregations joined back on their keys
    // (map-side combine, then a keyed shuffle that scales with the type
    // table), and the grand total is a single-row aggregate broadcast to
    // every partition — the same corpus-stats pattern bm25Scores uses.
    val cbg = docBigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val m1 = cbg.groupBy("w1").agg(sum(col("c")).as("c1"))
    val m2 = cbg.groupBy("w2").agg(sum(col("c")).as("c2"))
    val tot = cbg.agg(sum(col("c")).as("t"))
    cbg
      .filter(col("c") >= minCount)
      .join(m1, "w1")
      .join(m2, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c"),
        Exact.round6(log((col("c").cast("double") * col("t"))
          / (col("c1").cast("double") * col("c2")))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Span width for the cross-document repeated-span detector. */
  private[ops] val SpanTokens = 8

  /** Per-source token budget for the q_source_mix fixture. */
  private[ops] val MixTargetTokens = 1300

  /** Domain weights + total budget for the q_source_mix_weighted
    * fixture: fractional rates (src0-src3, all under-budget at the
    * generated SFs) and the excluded branch (every unlisted source,
    * weight 0) are exercised here; the saturated rate-1 branch is
    * covered by q_source_mix (6 sources clear the uniform budget at
    * sf0.01).
    */
  private[ops] val MixWeights =
    Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
  private[ops] val MixWeightedBudget = 2000L

  /** Temperature + budget for the q_source_mix_temperature fixture:
    * alpha 0.5 (the sqrt determinism path); budget 6000 gives every
    * source a fractional rate (~0.21-0.24) at sf0.01 while the smaller
    * sf0.001 totals push rates past 1 — both threshold branches
    * exercised across the suite's scales.
    */
  private[ops] val MixTemperatureAlpha = 0.5
  private[ops] val MixTemperatureBudget = 6000L

  /** Budget-driven source rebalancing — the data-MIXING step of a
    * training run: each source whose token mass exceeds `targetTokens`
    * is deterministically hash-downsampled to (approximately) the
    * budget; smaller sources pass through whole. The keep decision is
    * the same md5-prefix threshold as [[hashSample]], but the per-source
    * rate — and therefore the threshold — is DERIVED FROM THE DATA
    * inside the plan (one tiny per-source aggregate broadcast back), so
    * the whole operator is two narrow corpus passes + two source-keyed
    * partial aggregations. The threshold spelling uses floor (not
    * round): floor of an IEEE double is engine-portable, while
    * half-up/half-even rounding differences could flip a boundary
    * threshold. Output: per source, the doc/token totals, the applied
    * rate, and the kept doc/token counts.
    */
  /** Tokenized (doc_id, source, n_tokens) projection + per-source
    * totals — the shared first pass of both mixing operators.
    */
  private def sourceTotals(docs: DataFrame): (DataFrame, DataFrame) = {
    val t = docs.select(col("doc_id"), col("source"),
      TextOps.wordCount(col("text")).as("n_tokens"))
    val tot = t.groupBy("source").agg(
      sum(col("n_tokens")).as("total_tokens"),
      count(lit(1)).as("n_docs_total"))
    (t, tot)
  }

  /** Apply a per-source `rate` column (on `withRate`, keyed by source)
    * to the tokenized rows: derive the md5-prefix threshold, broadcast
    * it back, and aggregate kept doc/token counts per source — the
    * shared second pass of both mixing operators. Extra grouping
    * columns (e.g. the weight) ride through `extraCols`.
    */
  private def applyRates(
      t: DataFrame, withRate: DataFrame, extraCols: Seq[String]): DataFrame = {
    // 8-hex threshold of rate·2^32 (lowercase, zero-padded, floor'd);
    // rate 1 -> "g" sorts above every hex prefix = keep everything
    val thr = withRate.withColumn("h_thr",
      when(col("rate") >= 1.0, lit("g"))
        .otherwise(lower(lpad(conv(
          floor(least(col("rate") * 4294967296.0, lit(4294967295.0)))
            .cast("bigint").cast("string"), 10, 16), 8, "0"))))
    t.join(broadcast(thr.withColumnRenamed("source", "ts")),
        col("source") === col("ts"))
      .withColumn("__graft_h", substring(md5(col("doc_id").cast("string")), 1, 8))
      .groupBy(col("source") +: col("n_docs_total") +: col("total_tokens") +:
        extraCols.map(col) :+ Exact.round6(col("rate")).as("rate"): _*)
      .agg(
        count(when(col("__graft_h") < col("h_thr"), 1)).as("n_docs_kept"),
        coalesce(sum(when(col("__graft_h") < col("h_thr"), col("n_tokens"))), lit(0L))
          .as("kept_tokens"))
      .boundedSort("source")
  }

  def sourceMix(docs: DataFrame, targetTokens: Long): DataFrame = {
    val (t, tot) = sourceTotals(docs)
    val withRate = tot.withColumn("rate",
      least(lit(1.0), lit(targetTokens).cast("double") / col("total_tokens")))
    applyRates(t, withRate, Seq.empty)
  }

  /** Domain-WEIGHTED mixture (the practice behind pretraining mixes —
    * "web 60%, books 20%, code 20%"): each source's token target is
    * `weight(source) × totalBudget`, its keep rate the usual
    * min(1, target/total), and a source absent from the weight map gets
    * weight 0 — excluded from the mixture entirely, kept counts 0. Same
    * two narrow corpus passes + two source-keyed partial aggregations
    * as [[sourceMix]]; the weight map rides as a literal into the tiny
    * per-source aggregate. Output adds the applied `weight` column.
    */
  def sourceMixWeighted(
      docs: DataFrame, weights: Map[String, Double], totalBudget: Long): DataFrame = {
    require(weights.nonEmpty, "sourceMixWeighted needs a non-empty weight map")
    require(weights.values.forall(w => w >= 0 && !w.isNaN && !w.isInfinite),
      s"weights must be finite and >= 0, got $weights")
    val (t, tot) = sourceTotals(docs)
    val withRate = tot
      .withColumn("weight",
        coalesce(element_at(typedLit(weights), col("source")), lit(0.0)))
      .withColumn("rate",
        least(lit(1.0),
          col("weight") * lit(totalBudget).cast("double") / col("total_tokens")))
    applyRates(t, withRate, Seq("weight"))
  }

  /** Temperature-flattened mixture — the sampling schedule pretraining
    * runs use to upweight small high-quality domains (weights
    * proportional to share^alpha; GPT-3's alpha≈0.7-style flattening,
    * uniform as alpha→0, natural proportions at alpha=1). Because the
    * share normalization cancels, weight_s = total_s^alpha /
    * Σ_s' total_s'^alpha needs no grand total; the rate is the usual
    * min(1, weight·budget/total_s).
    *
    * Cross-engine determinism discipline (the derived weight is a
    * DOUBLE in the output contract): alpha = 0.5 rides `sqrt` —
    * IEEE-correctly-rounded in BOTH engines, unlike `pow`, whose libm
    * results may differ by an ulp and flip a keep decision at the hash
    * threshold — each powered total is round6'd, and the normalizer is
    * the EXACT decimal sum of the rounded terms (order-free), so
    * weight, rate, and threshold are bit-identical vs the oracle. Same
    * two narrow corpus passes + aggregate-scale model table as
    * [[sourceMix]]; the normalizer is a one-row broadcast.
    * An empty source (zero tokens) gets weight 0 / rate 0 explicitly —
    * never a NaN threshold. Verified by `q_source_mix_temperature`.
    */
  def sourceMixTemperature(
      docs: DataFrame, alpha: Double, totalBudget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1 && !alpha.isNaN,
      s"sourceMixTemperature: alpha must be in (0, 1], got $alpha")
    require(totalBudget > 0, s"totalBudget must be > 0, got $totalBudget")
    val (t, tot) = sourceTotals(docs)
    val powered =
      if (alpha == 0.5) sqrt(col("total_tokens").cast("double"))
      else pow(col("total_tokens").cast("double"), lit(alpha))
    val p = tot.withColumn("__graft_pw", Exact.round6(powered))
    val norm = p.agg(Exact.dsum(col("__graft_pw")).as("__graft_spw"))
    val withRate = p.crossJoin(broadcast(norm))
      .withColumn("weight", col("__graft_pw") / col("__graft_spw"))
      .withColumn("rate",
        when(col("total_tokens") > 0,
          least(lit(1.0),
            col("weight") * lit(totalBudget).cast("double") / col("total_tokens")))
          .otherwise(lit(0.0)))
      .drop("__graft_pw", "__graft_spw")
    applyRates(t, withRate, Seq("weight"))
  }

  /** Most-repeated `n`-token word spans appearing in at least `minDocs`
    * distinct documents, top `k` by occurrence count. One explode into
    * an EXPLICIT two-phase distinct-doc aggregation, both phases plain
    * HashAggregates: phase 1 groups (span, doc_id) → per-doc occurrence
    * count (map-side combine collapses within-doc repeats before the
    * exchange), phase 2 groups span → total occurrences + distinct-doc
    * count. The span STRING is the group key on purpose: a carried
    * `min(span)` payload is a var-length aggregate BUFFER, which
    * HashAggregate cannot hold — the r9 spelling was measured planning
    * SortAggregates that fully sorted the exploded corpus at every
    * level (the dominant 555 ms of the query), while var-length group
    * KEYS hash fine; and `countDistinct` alongside other aggregates
    * would have added an Expand doubling every exploded row. The md5
    * tiebreak digest is computed on the aggregated survivors only
    * (vocabulary-scale), never per corpus row. Collision-correctness:
    * the oracle groups by `unhex(md5(span))`, which partitions rows
    * identically to the span string itself away from the 2^-64-scale
    * collision case; ties in the top-k order break on the digest
    * (bytewise-unsigned binary order in both engines).
    */
  def repeatedSpans(docs: DataFrame, n: Int, minDocs: Long, k: Int): DataFrame =
    docs
      .filter(TextOps.wordCount(col("text")) >= n)
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), n)).as("sp"))
      .groupBy(col("sp"), col("doc_id"))
      .agg(count(lit(1)).as("__graft_c"))
      .groupBy(col("sp"))
      .agg(sum(col("__graft_c")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_occurrences").desc, unhex(md5(col("sp"))))
      .limit(k)
      .select(col("sp").as("span"),
        col("n_occurrences").cast("long").as("n_occurrences"),
        col("n_docs"))

  /** Shingle-count ceiling for [[contaminationCheck]]'s literal path —
    * a benchmark's distinct-shingle set is eval-suite-bounded by
    * construction; 2M shingles ≈ 150 MB of set. Past it (or with the
    * cap at 0) the join path runs.
    */
  val MaxLiteralBenchShingles = 2000000L

  def contaminationCheck(corpus: DataFrame, benchmark: DataFrame,
      maxLiteralShingles: Long = MaxLiteralBenchShingles): DataFrame = {
    def shingled(df: DataFrame) = df
      .filter(TextOps.wordCount(col("text")) >= 3)
      .select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("shs"))
    val benchPlan = shingled(benchmark).select(explode(col("shs")).as("s")).distinct()
    // Literal-first (the trigramBackoffLm discipline): the benchmark
    // shingle set is MODEL STATE — one bounded collect, then the whole
    // corpus side is a single narrow codegen pass (tokenize + shingle +
    // per-doc dedup + set probe fused in graft_shingle_hits): no
    // exploded rows, no join, no doc-keyed aggregation — where the join
    // spelling explodes every distinct shingle occurrence and
    // re-aggregates the corpus by doc_id.
    val probe =
      if (maxLiteralShingles > 0) TinyLoop.boundedCollect(benchPlan, maxLiteralShingles)
      else Array.empty[org.apache.spark.sql.Row]
    if (maxLiteralShingles > 0 && probe.length <= maxLiteralShingles) {
      val hs = new java.util.HashSet[String](probe.length * 2)
      probe.foreach(r => hs.add(r.getString(0)))
      val bc = corpus.sparkSession.sparkContext.broadcast(new graft.functions.StrSet(hs))
      val st = org.apache.spark.sql.GraftBridge.column(graft.functions.ShingleHits(
        org.apache.spark.sql.GraftBridge.expression(col("text")), bc, 3))
      corpus
        .filter(TextOps.wordCount(col("text")) >= 3)
        .select(col("doc_id"), st.as("__graft_st"))
        .select(col("doc_id"),
          col("__graft_st.n_shingles").as("n_shingles"),
          col("__graft_st.n_hit").as("n_hit"))
        .withColumn("frac", col("n_hit").cast("double") / col("n_shingles"))
    } else {
      val bench = benchPlan.withColumn("__graft_hit", lit(1))
      shingled(corpus)
        .select(col("doc_id"), size(col("shs")).cast("long").as("n_shingles"),
          explode(col("shs")).as("s"))
        .join(broadcast(bench), Seq("s"), "left")
        .groupBy("doc_id")
        .agg(max(col("n_shingles")).as("n_shingles"),
          count(col("__graft_hit")).as("n_hit"))
        .select(col("doc_id"), col("n_shingles"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_shingles")).as("frac"))
    }
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` terms — the signal a tokenizer/vocab rollout uses
    * to find documents the vocabulary serves poorly. Two corpus passes:
    * the vocabulary is a bounded top-k (broadcast), the per-doc pass is
    * one aggregation keyed by doc_id.
    */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    val terms = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
    val vocab = terms.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
      .select(col("w").as("vw"))
    terms.join(broadcast(vocab), col("w") === col("vw"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("vw").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** Bucket-count cap for [[valueDeciles]]' literal-offsets path: the
    * offset table is bounded by metric_range / bucketWidth — a DOMAIN
    * property (logprob range, document-length cap), not a corpus-size
    * one — so callers that choose a sane width stay far under this.
    * 64k buckets ≈ 1 MB of broadcast state.
    */
  val MaxLiteralDecileBuckets = 65536L

  /** Global decile assignment by `metricCol` without a single-task
    * window: fixed-width value buckets partition the rank computation
    * (the q_rank_global two-phase recipe), a tiny per-bucket offset
    * table turns in-bucket ranks into global ranks, and the decile is
    * integer arithmetic on the global rank — the curriculum-bucketing
    * step of a training-data pipeline, at any corpus size.
    *
    * NOTE: EAGER under the literal path (the [[bigramLogProb]]
    * discipline) — the bucket histogram is collected at call time to
    * decide the physical path and bake the offsets; decile cutoffs are
    * MODEL STATE (the perplexity gate's streaming recipe freezes
    * exactly these), so the collect is the one bounded model read, not
    * a data-scale driver pull. Past [[MaxLiteralDecileBuckets]] the
    * distributed broadcast-offsets spelling takes over (dual-path
    * equality spec'd in GraftOpsSpec).
    */
  def valueDeciles(
      df: DataFrame, metricCol: String, idCol: String,
      bucketWidth: Int, carryCols: Seq[String] = Nil,
      maxLiteralBuckets: Long = MaxLiteralDecileBuckets): DataFrame = {
    // carry columns are selected alongside the recipe's internals — a
    // collision would be an ambiguous reference or silently wrong
    // decile arithmetic, so fail with the contract-naming message the
    // SQL builders use
    val reserved = Set("n_total", "__graft_bkt", "__graft_rn", "__graft_off",
      idCol, metricCol)
    val clash = carryCols.filter(reserved)
    require(clash.isEmpty,
      s"valueDeciles: carryCols ${clash.mkString(", ")} collide with " +
        s"reserved internal names (${reserved.toSeq.sorted.mkString(", ")}) — " +
        "rename the carried column(s) before calling")
    val base = df.select(
      (Seq(idCol, metricCol) ++ carryCols).map(col): _*)
    // bucket id in LONG integer arithmetic: a double divide cast to int
    // would clamp metrics beyond ~2^31·width into one saturated bucket
    // (re-creating the single-task window this recipe exists to avoid)
    // and lose precision past 2^53. Truncating the metric to BIGINT
    // first is fine: any monotone bucketing partitions correctly.
    // Null metrics are dropped up front: the distributed path's inner
    // offsets join already excludes them, and dropping before the
    // bucket exchange keeps the literal path identical (a null bucket
    // key would otherwise unbox to 0 in the histogram collect and
    // corrupt real bucket 0's cumulative offset) while shipping fewer
    // rows through the shuffle.
    val bucketed = base.filter(col(metricCol).isNotNull).withColumn(
      "__graft_bkt", expr(s"CAST(`$metricCol` AS BIGINT) div $bucketWidth"))
    // Literal-offsets path: ONE bounded single-job collect of the
    // bucket histogram replaces the offsets subtree (a second full
    // evaluation of `df` into a groupBy + two aggregate-scale windows +
    // a broadcast build). The cumulative offsets and n_total are the
    // exact integer mirror of the wOff/wAll windows below; the probe is
    // a narrow codegen broadcast lookup, so the corpus-side plan is
    // exchange-on-bucket + in-bucket rank + project — nothing else.
    if (maxLiteralBuckets > 0) {
      val hist = graft.ops.TinyLoop.boundedCollect(
        bucketed.groupBy("__graft_bkt").agg(count(lit(1)).as("nb")),
        maxLiteralBuckets)
      if (hist.length <= maxLiteralBuckets) {
        return decilesFromHist(bucketed,
          hist.map(r => (r.getLong(0), r.getLong(1))).toSeq,
          metricCol, idCol, carryCols)
      }
    }
    decilesDistributed(bucketed, metricCol, idCol, carryCols)
  }

  /** [[valueDeciles]] with the bucket histogram riding the SAME job
    * that materializes the (narrow) scored rows, via observe/
    * CollectMetrics — for callers whose metric frame is a projection
    * they would checkpoint anyway (the perplexity gate): one job where
    * the checkpoint-then-histogram spelling costs two. Histogram
    * overflow past `maxLiteralBuckets` falls back to the distributed
    * offsets path over the already-materialized rows.
    */
  def valueDecilesObserved(
      df: DataFrame, metricCol: String, idCol: String,
      bucketWidth: Int, carryCols: Seq[String] = Nil,
      maxLiteralBuckets: Long = MaxLiteralDecileBuckets): DataFrame = {
    val reserved = Set("n_total", "__graft_bkt", "__graft_rn", "__graft_off",
      idCol, metricCol)
    val clash = carryCols.filter(reserved)
    require(clash.isEmpty,
      s"valueDecilesObserved: carryCols ${clash.mkString(", ")} collide with " +
        s"reserved internal names (${reserved.toSeq.sorted.mkString(", ")}) — " +
        "rename the carried column(s) before calling")
    require(maxLiteralBuckets > 0 && maxLiteralBuckets <= Int.MaxValue - 2,
      s"valueDecilesObserved needs an int-range positive bucket cap, " +
        s"got $maxLiteralBuckets")
    val base = df.select(
      (Seq(idCol, metricCol) ++ carryCols).map(col): _*)
    val bucketedPlan = base.filter(col(metricCol).isNotNull).withColumn(
      "__graft_bkt", expr(s"CAST(`$metricCol` AS BIGINT) div $bucketWidth"))
    val (bucketed, row) = graft.ops.TinyLoop.corpusCheckpointObserved(
      bucketedPlan,
      Seq(graft.functions.GraftFunctions.key_counts(
        col("__graft_bkt"), maxLiteralBuckets.toInt)))
    if (!row.isNullAt(0))
      decilesFromHist(bucketed, row.getMap[Long, Long](0).toSeq,
        metricCol, idCol, carryCols)
    else decilesDistributed(bucketed, metricCol, idCol, carryCols)
  }

  /** Literal-offsets decile assignment from a collected bucket
    * histogram (bkt, count): cumulative offsets and n_total computed
    * driver-side in exact integer arithmetic, probed by a narrow
    * codegen broadcast lookup.
    */
  private def decilesFromHist(
      bucketed: DataFrame, hist: Seq[(Long, Long)],
      metricCol: String, idCol: String, carryCols: Seq[String]): DataFrame = {
    val wIn = Window.partitionBy("__graft_bkt")
      .orderBy(col(metricCol), col(idCol))
    val sorted = hist.sortBy(_._1)
    val nTotal = sorted.iterator.map(_._2).sum
    val hm = new java.util.HashMap[java.lang.Long, java.lang.Long](
      sorted.length * 2)
    var acc = 0L
    sorted.foreach { case (bkt, nb) => hm.put(bkt, acc); acc += nb }
    val bc = bucketed.sparkSession.sparkContext
      .broadcast(new graft.functions.LongMap(hm))
    bucketed
      .withColumn("__graft_rn", row_number().over(wIn))
      .withColumn("__graft_off", org.apache.spark.sql.GraftBridge.column(
        graft.functions.LongMapLookup(
          org.apache.spark.sql.GraftBridge.expression(col("__graft_bkt")),
          bc)))
      .select(Seq(col(idCol), col(metricCol)) ++ carryCols.map(col) :+
        (expr(s"(__graft_off + __graft_rn - 1) * 10 div CAST($nTotal AS BIGINT)") + 1)
          .as("decile"): _*)
  }

  private def decilesDistributed(
      bucketed: DataFrame,
      metricCol: String, idCol: String, carryCols: Seq[String]): DataFrame = {
    val wIn = Window.partitionBy("__graft_bkt")
      .orderBy(col(metricCol), col(idCol))
    val wOff = Window.orderBy("__graft_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    // n_total rides the same aggregate-scale bucket table (unbounded
    // window) instead of a separate corpus aggregation — one fewer
    // broadcast build job and no crossJoin
    val wAll = Window.orderBy("__graft_bkt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = bucketed.groupBy("__graft_bkt")
      .agg(count(lit(1)).as("nb"))
      .withColumn("__graft_off", coalesce(sum("nb").over(wOff), lit(0L)))
      .withColumn("n_total", sum("nb").over(wAll))
      .select("__graft_bkt", "__graft_off", "n_total")
    bucketed
      .withColumn("__graft_rn", row_number().over(wIn))
      .join(broadcast(offsets), "__graft_bkt")
      .select(Seq(col(idCol), col(metricCol)) ++ carryCols.map(col) :+
        (expr("(__graft_off + __graft_rn - 1) * 10 div n_total") + 1)
          .as("decile"): _*)
  }

  /** BPE merge training — the actual tokenizer-training loop. One
    * corpus-scale pass builds the word-frequency histogram; every merge
    * round then runs on that VOCABULARY-BOUNDED table (the structural
    * reason BPE trains in minutes on a trillion-token corpus): count
    * adjacent symbol pairs weighted by word frequency, pick the most
    * frequent (ties to the lexicographically smallest pair), splice the
    * winner into every word's symbol string. Symbols are tracked as a
    * space-joined string; the splice pads with spaces so a pair can
    * only match at symbol boundaries, and both engines' literal
    * `replace` scans left-to-right non-overlapping, so the splice is
    * deterministic and identical cross-engine. Documented
    * simplification vs reference BPE implementations: within a RUN of
    * ≥4 identical symbols, non-overlapping replace pairs (1,2) and
    * resumes after the shared boundary space, so e.g. "a a a a" becomes
    * "aa a a" in the round rather than "aa aa" — the next rounds still
    * merge the remainder, but run-heavy corpora can order merges
    * differently than a pairwise-rescan trainer. Only the corpus-scale
    * word histogram is localCheckpoint'd; the per-round splices are
    * LITERAL projections (the winner is collected model state), so the
    * plan stays linear in `rounds` with no further materialization —
    * each round is exactly ONE vocabulary-bounded job. Returns
    * (round, pair, cnt) per merge.
    */
  def bpeMerges(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bpeMerges requires rounds >= 1, got $rounds")
    val wfreq = docs
      .select(explode(words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // merge rounds iterate this tiny table; never re-read the corpus
      .localCheckpoint()
    // model-state iteration scope (see TinyLoop): every job below the
    // histogram iterates the VOCABULARY-BOUNDED table — AQE's extra
    // stage-job per round and 32 near-empty reduce tasks are pure
    // scheduling floor on it. wfreq itself (the one corpus-scale pass)
    // was materialized eagerly above, OUTSIDE this scope; inside it the
    // re-bound frame plans on the scoped clone, so a concurrent query
    // on the caller's session keeps AQE and full parallelism.
    TinyLoop.withModelState(wfreq) { wf =>
      // the symbol column and every round's splice are NARROW literal
      // projections over the checkpointed histogram, so no further
      // checkpoint is needed for plan linearity — a round's histogram
      // job simply re-runs the (tiny, vocabulary-bounded) splice chain.
      // The per-round localCheckpoint this replaces was one pure
      // scheduling-floor job per round: at sf0.1 it roughly doubled
      // q_bpe_merges' wall time for zero recompute saved.
      var v = wf
        .withColumn("cs", trim(regexp_replace(col("word"), "(.)", "$1 ")))
      // the per-round winner is ONE row of model state — collect it and
      // bake the splice as LITERALS (the k-means centroid policy): the
      // previous spelling localCheckpoint'd the winner, probed isEmpty,
      // and broadcast-crossJoined it back — three extra scheduling-floor
      // jobs per round for a single driver-sized value
      val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, Long)]
      var exhausted = false
      var r = 1
      while (r <= rounds && !exhausted) {
        val best = v
          .select(col("freq"), explode(TextOps.shingles(col("cs"), 2)).as("pair"))
          .groupBy("pair").agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair")).limit(1)
          .collect().headOption
        best match {
          case None =>
            // every word is a single symbol: no pair to merge — stop
            exhausted = true
          case Some(row) =>
            val (bp, cnt) = (row.getString(0), row.getLong(1))
            merges += ((r, bp, cnt))
            // literal splice via Column functions, NOT a SQL string —
            // the pair text is data and must never be parsed as SQL
            v = v.withColumn("cs", trim(org.apache.spark.sql.functions.replace(
                concat(lit(" "), col("cs"), lit(" ")),
                lit(" " + bp + " "),
                lit(" " + bp.replace(" ", "") + " "))))
        }
        r += 1
      }
      import docs.sparkSession.implicits._
      merges.toSeq.toDF("round", "pair", "cnt")
    }
  }

  /** Apply the [[bpeMerges]]-trained merge list to every word occurrence
    * and report per-document tokenization stats — the ENCODE half of the
    * BPE story (train → apply), and the compression measurement a
    * tokenizer team reads: characters per emitted token.
    *
    * The trained merge list is MODEL STATE (≤ `rounds` tiny rows), so —
    * like the k-means centroids — it is collected and baked into ONE
    * literal, codegen-friendly chain of boundary-padded splices: the
    * corpus-scale encode pass is a single narrow projection + one
    * doc-keyed aggregation, no join against the merge table at all.
    * A corpus that exhausts before `rounds` merges simply applies the
    * merges that exist (zero splices on an unsplittable corpus).
    * Output: (doc_id, n_words, n_chars, n_tokens, compression).
    */
  def bpeEncode(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bpeEncode requires rounds >= 1, got $rounds")
    val merges = bpeMerges(docs, rounds)
      .orderBy("round").collect().map(_.getString(1)).toSeq
    // char-split then splice each merge in training order — the same
    // spelling the trainer (and its oracle) uses, so an encoded word is
    // exactly the trainer's final symbol sequence for that word
    val enc0 = trim(regexp_replace(col("word"), "(.)", "$1 "))
    val encoded = merges.foldLeft(enc0) { (acc, p) =>
      trim(replace(concat(lit(" "), acc, lit(" ")),
        lit(s" $p "), lit(" " + p.replace(" ", "") + " ")))
    }
    docs
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .select(col("doc_id"), length(col("word")).as("nc"),
        size(split(encoded, " ")).as("nt"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("nc")).cast("long").as("n_chars"),
        sum(col("nt")).cast("long").as("n_tokens"),
        // exact long/long division — bit-identical cross-engine, no
        // rounding needed
        (sum(col("nc")).cast("double") / sum(col("nt"))).as("compression"))
      .orderBy("doc_id")
  }

  /** Fixed-size overlapping token windows (the chunking step ahead of
    * embedding/RAG indexing, and the context-window packing sibling of
    * [[packSequences]]): each document yields chunks of `window` tokens
    * starting every `stride` tokens (the tail chunk may be shorter).
    * FULLY NARROW — tokenize once, explode the start offsets, slice —
    * no shuffle anywhere except a presentation sort; chunk volume per
    * doc is O(n_tokens / stride), independent of corpus size.
    * Output: (doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text).
    */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), col("ws"),
        posexplode(sequence(lit(0), size(col("ws")) - 1, lit(stride)))
          .as(Seq("ci", "start")))
      .select(
        col("doc_id"),
        col("ci").cast("long").as("chunk_id"),
        col("start").cast("long").as("start_token"),
        size(slice(col("ws"), col("start") + 1, lit(window))).cast("long")
          .as("n_chunk_tokens"),
        array_join(slice(col("ws"), col("start") + 1, lit(window)), " ")
          .as("chunk_text"))
    // no presentation sort here: the operator is fully narrow, so it
    // applies to an unbounded stream unchanged (StreamingSpec pins
    // that); the registered query adds its own total order for the
    // oracle compare
  }

  /** Latest-wins merge. With `rowIdCol` set (a GLOBALLY unique column
    * that appears in `orderCols`, e.g. an event id used as the final
    * tiebreaker — the "precombine key" every lakehouse merger demands)
    * the merge is SORT-FREE, the dedupExact discipline applied to
    * keep-LAST: a narrow (key, orderCols) keeper aggregation picks each
    * key's max order tuple (struct max — SortAggregate, but over the
    * NARROW projection only), the winning row ids semi-join back by
    * hinted shuffled-hash join, and the full payload crosses its one
    * exchange unsorted. Without `rowIdCol` the row_number window
    * spelling is kept: under order ties it returns exactly one
    * arbitrary row per key, which no join-back spelling can reproduce.
    */
  def mergeLatest(
      base: DataFrame, delta: DataFrame, keyCol: String,
      orderCols: Seq[String], rowIdCol: Option[String] = None): DataFrame = {
    val uni = base.unionByName(delta)
    rowIdCol match {
      case Some(rid) =>
        require(orderCols.contains(rid),
          s"mergeLatest: rowIdCol '$rid' must appear in orderCols " +
            s"(${orderCols.mkString(", ")}) — a unique final tiebreaker is " +
            "what makes the order total and the sort-free spelling exact")
        val keepers = uni
          .groupBy(col(keyCol))
          .agg(max(struct(orderCols.map(col): _*)).as("__graft_mx"))
          .select(col("__graft_mx").getField(rid).as(rid))
          .hint("shuffle_hash")
        uni.join(keepers, Seq(rid), "left_semi")
          .select(uni.columns.map(col).toSeq: _*)
      case None =>
        val w = Window.partitionBy(keyCol)
          .orderBy(orderCols.map(c => col(c).desc): _*)
        uni
          .withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1)
          .drop("__graft_rn")
    }
  }

  /** Fixed query-term set shared by the BM25 and hybrid-fusion queries. */
  private[ops] val Bm25Terms = Seq("spark", "query", "join", "data", "stream")

  /** Okapi BM25 (k1=1.2, b=0.75) per-document scores for a fixed query
    * term set: (doc_id, score). Per-term df and the one-row corpus stats
    * arrive by broadcast; the fact-scale work is the same (doc, term)
    * aggregation the inverted index uses. Per-term scores are rounded
    * then exact-decimal-summed for cross-engine parity.
    */
  def bm25Scores(docs: DataFrame, queryTermsRaw: Seq[String]): DataFrame = {
    // One slot per DISTINCT term: a duplicated query term would get two
    // token_set_counts slots and contribute its term score twice, where
    // the r9 explode + isin + groupBy(doc, term) spelling scored each
    // distinct term once. BM25 over a term multiset is a different
    // (and non-standard) function; keep set semantics.
    val queryTerms = queryTermsRaw.distinct
    val k1 = lit(1.2)
    val b = lit(0.75)
    // ONE fused corpus pass (r10; the r9 spelling ran two — a length
    // pass and an explode-to-term-rows pass — then joined them back
    // with the frequency table): per-doc length + per-query-term
    // occurrence counts from the fused TokenSetCounts codegen scan,
    // materialized once. The checkpoint is the standard narrow per-doc
    // persist of a multi-read pipeline stage.
    val perDoc = TinyLoop.corpusCheckpoint(
      docs.select(col("doc_id"),
          TextOps.wordCount(col("text")).as("dl"),
          graft.functions.GraftFunctions.token_set_counts(
            words(col("text")), queryTerms.map(Seq(_))).as("tfs"))
        .filter(col("dl") > 0))
    // BM25's whole model state is K+2 numbers (N, Σdl, per-term doc
    // frequency) — bounded by the QUERY's term count, not the corpus —
    // so it is always literal state: one single-job aggregation read,
    // then the stats bake into the scoring expression and no join
    // (broadcast or otherwise) appears anywhere in the plan. This makes
    // construction EAGER (the bigramLogProb discipline).
    val statCols =
      count(lit(1)).as("n") +:
      Exact.dsum(col("dl")).as("sumdl") +:
      queryTerms.indices.map(i =>
        sum(when(element_at(col("tfs"), i + 1) > 0, 1L).otherwise(0L))
          .as(s"df$i"))
    val statsRow = TinyLoop.boundedCollect(
      perDoc.agg(statCols.head, statCols.tail: _*), 2L).head
    val n = statsRow.getLong(0)
    // same IEEE division the old in-plan `dsum(dl) / count` performed
    val avgdl = statsRow.getDouble(1) / n
    val dfs = queryTerms.indices.map(i => statsRow.getLong(2 + i)).toArray
    // scoring: narrow posexplode of the K-slot count array; df arrives
    // by slot index from a K-element literal. The term-score expression
    // is the r9 tree verbatim with the model columns replaced by
    // literals, so every double op folds identically.
    val termScore = Exact.round6(
      log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + 1)
        * (col("tf") * (k1 + 1))
        / (col("tf") + k1 * (lit(1) - b + b * col("dl") / lit(avgdl))))
    perDoc
      .select(col("doc_id"), col("dl"), posexplode(col("tfs")))
      .toDF("doc_id", "dl", "i", "tf")
      .filter(col("tf") > 0)
      .withColumn("df", element_at(typedlit(dfs), col("i") + 1))
      .select(col("doc_id"), termScore.as("term_score"))
      .groupBy("doc_id")
      .agg(Exact.round6(Exact.dsum(col("term_score"))).as("score"))
  }

  /** DuckDB CTE prefix producing `bmscore(doc_id, score)` — shared by
    * the q_bm25 oracle and the hybrid-fusion oracle (SimilarityOps).
    */
  private[ops] val Bm25Cte: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""dls AS (
       |  SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS dl
       |  FROM documents WHERE len($WordsSql) > 0),
       |stats AS (
       |  SELECT COUNT(*) AS n,
       |         CAST(SUM(CAST(dl AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM dls),
       |tf AS (
       |  SELECT doc_id, w AS term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest($WordsSql) AS w FROM documents)
       |  WHERE w IN $terms
       |  GROUP BY doc_id, w),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |ts AS (
       |  SELECT tf.doc_id,
       |         floor(ln((s.n - d.df + CAST(0.5 AS DOUBLE))
       |                  / (d.df + CAST(0.5 AS DOUBLE)) + 1)
       |               * (tf.tf * (CAST(1.2 AS DOUBLE) + 1))
       |               / (tf.tf + CAST(1.2 AS DOUBLE)
       |                  * (1 - CAST(0.75 AS DOUBLE)
       |                     + CAST(0.75 AS DOUBLE) * l.dl / s.avgdl)) * 1e6 + 0.5) / 1e6 AS term_score
       |  FROM tf JOIN dfreq d ON tf.term = d.term
       |  JOIN dls l ON tf.doc_id = l.doc_id
       |  CROSS JOIN stats s),
       |bmscore AS (
       |  SELECT doc_id,
       |         floor(CAST(SUM(CAST(term_score AS DECIMAL(38,10))) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS score
       |  FROM ts GROUP BY doc_id)""".stripMargin
  }

  /** Shared DuckDB CTE body replaying [[bpeMerges]]: wfreq + v0 + the
    * `rounds` unrolled merge rounds, yielding b1..b{rounds} (the winning
    * pairs) and v{rounds} (the final vocabulary state). Reused by the
    * training oracle and the encode oracle below.
    */
  private[ops] def bpeCtes(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT t.ts[i] || ' ' || t.ts[i+1] AS pair,
         |         CAST(SUM(t.freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, string_split(cs, ' ') AS ts FROM v${r - 1}) t,
         |       unnest(generate_series(1, len(t.ts) - 1)) AS u(i)
         |  GROUP BY 1),
         |b$r AS MATERIALIZED (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         |v$r AS MATERIALIZED (SELECT word, freq,
         |        trim(replace(' ' || cs || ' ', ' ' || (SELECT pair FROM b$r) || ' ',
         |             ' ' || replace((SELECT pair FROM b$r), ' ', '') || ' ')) AS cs
         |        FROM v${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""wfreq AS (
       |  SELECT w AS word, COUNT(*) AS freq
       |  FROM (SELECT unnest($WordsSql) AS w FROM documents) GROUP BY w),
       |v0 AS MATERIALIZED (SELECT word, freq,
       |       trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS cs FROM wfreq),
       |$steps""".stripMargin
  }

  /** DuckDB oracle for [[bpeMerges]]: `rounds` unrolled merge rounds
    * generated from the same loop shape.
    */
  private def bpeOracle(rounds: Int): String = {
    val out = (1 to rounds)
      .map(r => s"SELECT $r AS round, pair, cnt FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeCtes(rounds)}
       |$out
       |ORDER BY round""".stripMargin
  }

  /** DuckDB oracle for [[bpeEncode]]: replay training (shared CTEs),
    * then apply each winning pair in round order to every word
    * OCCURRENCE and aggregate per document.
    */
  private def bpeEncodeOracle(rounds: Int): String = {
    val applies = (1 to rounds).map { r =>
      s"""e$r AS MATERIALIZED (
         |  SELECT doc_id, word,
         |         trim(replace(' ' || cs || ' ', ' ' || (SELECT pair FROM b$r) || ' ',
         |              ' ' || replace((SELECT pair FROM b$r), ' ', '') || ' ')) AS cs
         |  FROM e${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeCtes(rounds)},
       |occ AS (
       |  SELECT doc_id, w AS word
       |  FROM (SELECT doc_id, unnest($WordsSql) AS w FROM documents)),
       |e0 AS MATERIALIZED (SELECT doc_id, word,
       |       trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS cs FROM occ),
       |$applies
       |SELECT doc_id,
       |       COUNT(*) AS n_words,
       |       CAST(SUM(len(word)) AS BIGINT) AS n_chars,
       |       CAST(SUM(len(string_split(cs, ' '))) AS BIGINT) AS n_tokens,
       |       CAST(SUM(len(word)) AS DOUBLE) / CAST(SUM(len(string_split(cs, ' '))) AS BIGINT)
       |         AS compression
       |FROM e$rounds GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // Registered oracle queries (each calls the facade path above)
  // --------------------------------------------------------------------

  def queries: Seq[Q] = Seq(
    // Gopher-style repetition/quality signals: the fraction of the
    // document taken by its most frequent word, the fraction of duplicate
    // bigrams, and the mean word length. The distinct-word scan is
    // O(n · distinct) per row — bounded by vocabulary, one codegen stage.
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
      graft.GraftOps.repetitionSignals(Tables.documents(s, d)).orderBy("doc_id")
    },

    // Sequence packing: concatenate each shard's documents in doc_id
    // order and chunk the token stream into fixed 512-token training
    // sequences (the GPT-style pack-then-split discipline; documents may
    // span a sequence boundary). One shuffle, keyed by shard.
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
      graft.GraftOps.packSequences(Tables.documents(s, d))
        .select("source", "doc_id", "n_tokens", "start_seq", "end_seq", "n_seqs")
        .orderBy("source", "doc_id")
    },

    // Inverted index: term -> document frequency, total term frequency,
    // and a capped posting list (first 20 doc_ids).
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
      graft.GraftOps.invertedIndex(Tables.documents(s, d)).orderBy("term")
    },

    // Deterministic stratified sampling: per-language rates via a
    // lexicographic compare of an md5-hex prefix against a rate
    // threshold (for fixed-width lowercase hex, string order == numeric
    // order — the same trick the MinHash suite uses). Reproducible
    // across runs and engines. Rates: en 1/8, zh 1/2, everything else 1/4.
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
      graft.GraftOps.hashSample(
        Tables.documents(s, d).select("doc_id", "lang"), "doc_id", "lang",
        Map("en" -> graft.GraftOps.sampleThreshold(0.125),
          "zh" -> graft.GraftOps.sampleThreshold(0.5)),
        graft.GraftOps.sampleThreshold(0.25))
        .orderBy("doc_id")
    },

    // Runtime-filter join: Bloom sketch over the filtered dimension's
    // keys, broadcast into a fact-side prefilter, then the exact semi
    // join. Bloom filters have no false negatives, so the prefilter
    // cannot change the result — it only cuts the fact rows entering the
    // join exchange (the point at 100 TB; Spark's
    // spark.sql.optimizer.runtime.bloomFilter.* does this rewrite
    // automatically past its size thresholds — this is the explicit,
    // library-callable form). The mightContain UDF is a pre-filter only —
    // every surviving row still goes through the codegen'd join, so
    // correctness never depends on the UDF.
    Q(
      "q_bloom_prefilter_join",
      """SELECT l_suppkey, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        |GROUP BY l_suppkey ORDER BY l_suppkey"""
    ) { (s, d) =>
      // expectedKeys from CATALOG stats: exact supplier cardinality
      // read from the parquet footers (zero jobs, Tables.rowCount) x
      // the predicate's selectivity (5 of the 25 fixed nations) — how a
      // production planner sizes the sketch; only the order of
      // magnitude matters, and the dim count job is skipped
      graft.GraftOps.bloomSemiJoin(
        Tables.lineitem(s, d).select(col("l_suppkey"), col("l_quantity")),
        "l_suppkey",
        Tables.supplier(s, d).filter(col("s_nationkey") < 5),
        "s_suppkey",
        expectedKeys = math.max(Tables.rowCount(s, d, "supplier") / 5, 100L))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"), Exact.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_suppkey")
    },

    // BM25 retrieval scoring (Okapi, k1=1.2 b=0.75) for a fixed query
    // term set — the ranking function a corpus search/retrieval layer
    // runs over the inverted stats. Everything data-dependent arrives by
    // broadcast (per-term df, the one-row corpus stats); the fact-scale
    // work is the same (doc, term) aggregation the inverted index uses.
    // Per-term scores are rounded then exact-decimal-summed so the
    // cross-engine doubles match despite ln/division.
    Q(
      "q_bm25",
      s"""WITH $Bm25Cte
         |SELECT doc_id, score FROM bmscore
         |ORDER BY score DESC, doc_id LIMIT 20"""
    ) { (s, d) =>
      bm25Scores(Tables.documents(s, d), Bm25Terms)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // Collocation mining: top-k adjacent word pairs by pointwise mutual
    // information (the "New York"-detector of corpus linguistics, and
    // the phrase-vocabulary step of tokenizer training). One corpus-scale
    // partial aggregation; the PMI margins ride windows over the
    // vocabulary-bounded count table.
    Q(
      "q_collocations",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |b AS (SELECT doc_id,
         |             list_transform(generate_series(1, len(ws) - 1),
         |                            i -> [ws[i], ws[i+1]]) AS bgs
         |      FROM w WHERE len(ws) >= 2),
         |pairs AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2
         |          FROM (SELECT doc_id, unnest(bgs) AS bg FROM b)),
         |cbg AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2),
         |m AS (SELECT w1, w2, c,
         |             CAST(SUM(c) OVER (PARTITION BY w1) AS BIGINT) AS c1,
         |             CAST(SUM(c) OVER (PARTITION BY w2) AS BIGINT) AS c2,
         |             CAST(SUM(c) OVER () AS BIGINT) AS t
         |      FROM cbg)
         |SELECT w1, w2, c,
         |       floor(ln((CAST(c AS DOUBLE) * t) / (CAST(c1 AS DOUBLE) * c2)) * 1e6 + 0.5) / 1e6 AS pmi
         |FROM m WHERE c >= 5
         |ORDER BY pmi DESC, w1, w2 LIMIT 20"""
    ) { (s, d) =>
      graft.GraftOps.collocations(Tables.documents(s, d), minCount = 5, k = 20)
    },

    // Benchmark decontamination: the fraction of each training document's
    // distinct 3-gram shingles that appear in a held-out benchmark set
    // (docs 0-9 here). The benchmark shingle set is tiny by construction
    // and BROADCAST; the corpus is exploded once, carrying its per-doc
    // total alongside, so the whole check is one broadcast join + one
    // aggregation keyed by doc_id — the shape that lets a 100 TB corpus
    // be decontaminated against any eval suite in a single pass.
    Q(
      "q_contamination",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |sh AS (SELECT doc_id,
         |              list_distinct(list_transform(generate_series(1, len(ws) - 2),
         |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
         |       FROM w WHERE len(ws) >= 3),
         |bench AS (SELECT DISTINCT unnest(shs) AS s FROM sh WHERE doc_id < 10),
         |ex AS (SELECT doc_id, CAST(len(shs) AS BIGINT) AS n_shingles,
         |              unnest(shs) AS s
         |       FROM sh WHERE doc_id >= 10),
         |m AS (SELECT e.doc_id,
         |             MAX(e.n_shingles) AS n_shingles,
         |             COUNT(b.s) AS n_hit
         |      FROM ex e LEFT JOIN bench b ON e.s = b.s
         |      GROUP BY e.doc_id)
         |SELECT doc_id, n_shingles, n_hit,
         |       CAST(n_hit AS DOUBLE) / n_shingles AS frac
         |FROM m ORDER BY doc_id"""
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.GraftOps.contamination(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10))
        .orderBy("doc_id")
    },

    // Latest-wins incremental merge (the lakehouse upsert discipline):
    // union the base snapshot with the delta and keep, per key, the row
    // with the greatest version. event_id is the globally unique final
    // tiebreaker (the precombine key), so the merge runs SORT-FREE: a
    // narrow (user_id, ts, event_id) keeper aggregation + a semi join
    // back on the winning event_ids — the event payload crosses its one
    // exchange unsorted (plan-pinned: no Window node). The oracle
    // states the semantic result (latest event per user over the whole
    // table), which the split + merge must reproduce exactly.
    Q(
      "q_upsert_latest",
      """SELECT user_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS last_ts,
        |       event_type AS last_type,
        |       value AS last_value
        |FROM (
        |  SELECT user_id, ts, event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id"""
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val base = ev.filter(col("ts") < lit("2024-01-20").cast("timestamp"))
      val delta = ev.filter(col("ts") >= lit("2024-01-20").cast("timestamp"))
      graft.GraftOps.mergeLatest(base, delta, "user_id", Seq("ts", "event_id"),
          rowIdCol = Some("event_id"))
        .select(col("user_id"),
          unix_timestamp(col("ts")).as("last_ts"),
          col("event_type").as("last_type"),
          col("value").as("last_value"))
        .orderBy("user_id")
    },

    // End-to-end curation composite: repetition-quality gate →
    // benchmark decontamination gate → per-shard sequence packing, all
    // through the same facade functions the individual oracles verify —
    // proof the operators COMPOSE (the actual shape of a pretraining
    // data run: gate, decontaminate, pack, account). Output is the
    // per-shard packing manifest.
    Q(
      "q_pipeline_e2e",
      s"""WITH w AS (SELECT doc_id, source, $WordsSql AS ws FROM documents),
         |b AS (SELECT doc_id, source, ws,
         |             list_transform(generate_series(1, len(ws) - 1),
         |                            i -> ws[i] || ' ' || ws[i+1]) AS bg
         |      FROM w WHERE len(ws) >= 2),
         |sig AS (SELECT doc_id, source, CAST(len(ws) AS BIGINT) AS n_tokens,
         |               1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) AS dbf
         |        FROM b),
         |sh AS (SELECT doc_id,
         |              list_distinct(list_transform(generate_series(1, len(ws) - 2),
         |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
         |       FROM w WHERE len(ws) >= 3),
         |bench AS (SELECT DISTINCT unnest(shs) AS s1 FROM sh WHERE doc_id < 10),
         |cont AS (SELECT e.doc_id, MAX(e.n_sh) AS n_sh, COUNT(b.s1) AS n_hit
         |         FROM (SELECT doc_id, CAST(len(shs) AS BIGINT) AS n_sh,
         |                      unnest(shs) AS s2
         |               FROM sh WHERE doc_id >= 10) e
         |         LEFT JOIN bench b ON e.s2 = b.s1 GROUP BY e.doc_id),
         |gated AS (SELECT sig.doc_id, sig.source, sig.n_tokens
         |          FROM sig JOIN cont ON sig.doc_id = cont.doc_id
         |          WHERE sig.n_tokens >= 10 AND sig.dbf <= 0.6
         |            AND CAST(cont.n_hit AS DOUBLE) / cont.n_sh < 0.2)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |       (CAST(SUM(n_tokens) AS BIGINT) + 511) // 512 AS n_seqs
         |FROM gated GROUP BY source ORDER BY source"""
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val keepQuality = graft.GraftOps.repetitionSignals(docs)
        .filter(col("n_tokens") >= 10 && col("dup_bigram_frac") <= 0.6)
        .select("doc_id")
      val keepClean = graft.GraftOps.contamination(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10))
        .filter(col("frac") < 0.2)
        .select("doc_id")
      val gated = docs.join(keepQuality, "doc_id").join(keepClean, "doc_id")
      graft.GraftOps.packSequences(gated)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          (max(col("end_seq")) + 1).as("n_seqs"))
        .boundedSort("source")
    },

    // Out-of-vocabulary rate per document against the corpus's own
    // top-20 terms (the vocabulary-coverage signal of tokenizer
    // training). The vocabulary is a bounded deterministic top-k
    // (freq desc, word) and arrives by broadcast.
    Q(
      "q_oov_rate",
      s"""WITH t AS (SELECT doc_id, unnest($WordsSql) AS w FROM documents),
         |v AS (SELECT w AS vw FROM (
         |        SELECT w, COUNT(*) AS c FROM t GROUP BY w
         |        ORDER BY c DESC, w LIMIT 20))
         |SELECT doc_id,
         |       COUNT(*) AS n_tokens,
         |       COUNT(CASE WHEN vw IS NULL THEN 1 END) AS n_oov,
         |       CAST(COUNT(CASE WHEN vw IS NULL THEN 1 END) AS DOUBLE) / COUNT(*)
         |         AS oov_rate
         |FROM t LEFT JOIN v ON t.w = v.vw
         |GROUP BY doc_id ORDER BY doc_id"""
    ) { (s, d) =>
      graft.GraftOps.oovRate(Tables.documents(s, d), vocabSize = 20)
        .orderBy("doc_id")
    },

    // Curriculum decile bucketing: every document assigned to a global
    // length decile WITHOUT a single-task global window — fixed-width
    // value buckets + in-bucket row_number + a broadcast offset table
    // (the q_rank_global two-phase recipe), then integer rank
    // arithmetic. The oracle states the semantic result with a plain
    // global window, which the distributed form must reproduce exactly.
    Q(
      "q_quality_deciles",
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS grank,
        |         COUNT(*) OVER () AS n_total
        |  FROM documents)
        |SELECT (grank - 1) * 10 // n_total + 1 AS decile,
        |       COUNT(*) AS n_docs,
        |       MIN(n_chars) AS min_chars,
        |       MAX(n_chars) AS max_chars
        |FROM r GROUP BY 1 ORDER BY decile"""
    ) { (s, d) =>
      graft.GraftOps.valueDeciles(
        Tables.documents(s, d), "n_chars", "doc_id", bucketWidth = 25)
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .boundedSort("decile")
    },

    // Quality/quantity tradeoff curve: for every decile cutoff d, how
    // many docs and tokens survive "keep deciles >= d" — the table a
    // data team reads before choosing a quality gate (the marginal
    // token cost of each extra notch of selectivity). Rides the shared
    // valueDeciles recipe with the token count carried through; the
    // reverse-cumulative window runs on the 10-row decile table, never
    // on corpus rows. token_frac is round6'd for cross-engine float
    // determinism.
    Q(
      "q_quality_tradeoff",
      s"""WITH r AS (
         |  SELECT doc_id, n_chars,
         |         CAST(len($WordsSql) AS BIGINT) AS n_tokens,
         |         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS grank,
         |         COUNT(*) OVER () AS n_total
         |  FROM documents),
         |d AS (SELECT (grank - 1) * 10 // n_total + 1 AS decile,
         |             COUNT(*) AS n_docs,
         |             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |      FROM r GROUP BY 1),
         |c AS (SELECT decile, n_docs, n_tokens,
         |             CAST(SUM(n_docs) OVER w AS BIGINT) AS docs_kept,
         |             CAST(SUM(n_tokens) OVER w AS BIGINT) AS tokens_kept,
         |             CAST(SUM(n_tokens) OVER () AS BIGINT) AS tokens_total
         |      FROM d
         |      WINDOW w AS (ORDER BY decile ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT decile, n_docs, n_tokens, docs_kept, tokens_kept,
         |       floor(CAST(tokens_kept AS DOUBLE) / tokens_total * 1e6 + 0.5) / 1e6 AS token_frac
         |FROM c ORDER BY decile"""
    ) { (s, d) =>
      val perDec = graft.GraftOps.valueDeciles(
        Tables.documents(s, d)
          .withColumn("n_tokens", TextOps.wordCount(col("text"))),
        "n_chars", "doc_id", bucketWidth = 25, carryCols = Seq("n_tokens"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"))
      val wRev = Window.orderBy("decile")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val wAll = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      perDec
        .withColumn("docs_kept", sum(col("n_docs")).over(wRev).cast("long"))
        .withColumn("tokens_kept", sum(col("n_tokens")).over(wRev).cast("long"))
        .withColumn("token_frac",
          Exact.round6(col("tokens_kept").cast("double") /
            sum(col("n_tokens")).over(wAll)))
        .select("decile", "n_docs", "n_tokens", "docs_kept", "tokens_kept",
          "token_frac")
        .orderBy("decile")
    },

    // BPE merge training: 3 unrolled merge rounds over the corpus's
    // word-frequency histogram — the tokenizer-training loop itself.
    // The corpus is read once (histogram); each round's pair counting,
    // argmax, and splice run on the vocabulary-bounded table. The
    // oracle unrolls the identical rounds.
    Q("q_bpe_merges", bpeOracle(3)) { (s, d) =>
      graft.GraftOps.bpeMerges(Tables.documents(s, d), rounds = 3)
        .orderBy("round")
    },

    // BPE ENCODE — the apply half of the tokenizer story: the 3 trained
    // merges (model state, collected like the k-means centroids) bake
    // into one literal splice chain, and every word occurrence encodes
    // in a single narrow projection; per-doc char/token totals give the
    // compression ratio a tokenizer team tunes against. The oracle
    // replays training (shared CTEs) and applies the same splices.
    Q("q_bpe_encode", bpeEncodeOracle(3)) { (s, d) =>
      graft.GraftOps.bpeEncode(Tables.documents(s, d), rounds = 3)
    },

    // Overlapping token-window chunking (window 16, stride 8): the
    // narrow chunking pass ahead of embedding/RAG indexing. The oracle
    // replays the same tokenize → offsets → slice; list_slice's
    // inclusive end == slice's length arg, both tail-clamped.
    Q(
      "q_chunk_windows",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |s AS (
         |  SELECT doc_id, ws, CAST(u.s AS BIGINT) AS start
         |  FROM w, unnest(generate_series(0, len(ws) - 1, 8)) AS u(s)
         |  WHERE len(ws) > 0)
         |SELECT doc_id,
         |       start // 8 AS chunk_id,
         |       start AS start_token,
         |       CAST(len(list_slice(ws, start + 1, start + 16)) AS BIGINT) AS n_chunk_tokens,
         |       array_to_string(list_slice(ws, start + 1, start + 16), ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin
    ) { (s, d) =>
      graft.GraftOps.chunkDocuments(Tables.documents(s, d), window = 16, stride = 8)
        .orderBy("doc_id", "chunk_id")
    },

    // Corpus bigram language model: MLE conditional probabilities from
    // the corpus itself, then an average log-probability score per
    // document (the perplexity-style quality filter a pretraining
    // pipeline runs).
    Q(
      "q_bigram_lm",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |b AS (SELECT doc_id,
         |             list_transform(generate_series(1, len(ws) - 1),
         |                            i -> [ws[i], ws[i+1]]) AS bgs
         |      FROM w WHERE len(ws) >= 2),
         |pairs AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2
         |          FROM (SELECT doc_id, unnest(bgs) AS bg FROM b)),
         |cbg AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2),
         |cuni AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cu FROM cbg GROUP BY w1),
         |scored AS (
         |  SELECT p.doc_id,
         |         floor(ln(CAST(cb.c AS DOUBLE) / cu.cu) * 1e6 + 0.5) / 1e6 AS lp
         |  FROM pairs p
         |  JOIN cbg cb ON p.w1 = cb.w1 AND p.w2 = cb.w2
         |  JOIN cuni cu ON p.w1 = cu.w1)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |       floor(CAST(SUM(CAST(lp AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
         |         AS avg_logprob
         |FROM scored GROUP BY doc_id ORDER BY doc_id"""
    ) { (s, d) =>
      graft.GraftOps.bigramLogProb(Tables.documents(s, d)).orderBy("doc_id")
    },

    // Cross-document repeated spans: the most-repeated 8-token word
    // spans appearing in >= 2 documents — the boilerplate/template
    // detector behind exact-substring dedup (headers, licence blocks,
    // navigation chrome dominate a web crawl). One explode + one
    // partial-agg shuffle keyed by unhex(md5(span)) — 16-byte binary
    // keys cross the exchange, not raw span strings — with the
    // distinct-doc count as a two-phase aggregate. The oracle groups by
    // the IDENTICAL unhex(md5(span)) (and tie-breaks the top-k on it),
    // so the engines agree by construction even under hash collision.
    Q(
      "q_repeated_spans",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |sp AS (SELECT doc_id,
         |              unnest(list_transform(generate_series(1, len(ws) - ${SpanTokens - 1}),
         |                     i -> ${(0 until SpanTokens).map(j => if (j == 0) "ws[i]" else s"ws[i+$j]").mkString(" || ' ' || ")})) AS span
         |       FROM w WHERE len(ws) >= $SpanTokens),
         |g AS (SELECT unhex(md5(span)) AS h, MIN(span) AS span,
         |             COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
         |      FROM sp GROUP BY unhex(md5(span))
         |      HAVING COUNT(DISTINCT doc_id) >= 2)
         |SELECT span, n_occurrences, n_docs
         |FROM g ORDER BY n_occurrences DESC, h LIMIT 20"""
    ) { (s, d) =>
      graft.GraftOps.repeatedSpans(Tables.documents(s, d), SpanTokens, 2, 20)
    },

    // Budget-driven source mixing: sources over the token budget are
    // hash-downsampled toward it, small sources pass whole — with the
    // per-source rate (and hash threshold) derived from the data inside
    // the plan. The deterministic sibling of the weighted-mixture
    // sampling every pretraining run does.
    Q(
      "q_source_mix",
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($WordsSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |tot AS (
         |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |         COUNT(*) AS n_docs_total
         |  FROM t GROUP BY source),
         |r AS (
         |  SELECT source, total_tokens, n_docs_total,
         |         LEAST(CAST(1.0 AS DOUBLE),
         |               CAST($MixTargetTokens AS DOUBLE) / total_tokens) AS rate
         |  FROM tot),
         |thr AS (
         |  SELECT *, CASE WHEN rate >= 1.0 THEN 'g'
         |                 ELSE printf('%08x', CAST(floor(LEAST(rate * 4294967296.0, 4294967295.0)) AS BIGINT))
         |            END AS h_thr
         |  FROM r)
         |SELECT t.source, n_docs_total, total_tokens, floor(rate * 1e6 + 0.5) / 1e6 AS rate,
         |       COUNT(CASE WHEN substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < h_thr THEN 1 END) AS n_docs_kept,
         |       CAST(COALESCE(SUM(CASE WHEN substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < h_thr THEN t.n_tokens END), 0) AS BIGINT) AS kept_tokens
         |FROM t JOIN thr ON t.source = thr.source
         |GROUP BY 1, 2, 3, 4 ORDER BY t.source"""
    ) { (s, d) =>
      graft.GraftOps.sourceMix(Tables.documents(s, d), MixTargetTokens)
    },

    // Domain-WEIGHTED mixture: per-source targets are weight × budget
    // (src0 40% / src1 30% / src2 20% / src3 10%, 16 unlisted sources
    // excluded with weight 0) — fractional and zero keep rates
    // exercised here, the saturated branch by q_source_mix; the weight
    // map rides as a SQL CASE on the oracle side, a literal map column
    // on the Spark side.
    Q(
      "q_source_mix_weighted",
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($WordsSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |tot AS (
         |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |         COUNT(*) AS n_docs_total
         |  FROM t GROUP BY source),
         |r AS (
         |  SELECT source, total_tokens, n_docs_total,
         |         ${MixWeights.toSeq.sortBy(_._1)
                      .map { case (s0, w) => s"WHEN source = '$s0' THEN CAST($w AS DOUBLE)" }
                      .mkString("CASE ", " ", " ELSE CAST(0.0 AS DOUBLE) END")} AS weight,
         |         LEAST(CAST(1.0 AS DOUBLE),
         |               (${MixWeights.toSeq.sortBy(_._1)
                      .map { case (s0, w) => s"WHEN source = '$s0' THEN CAST($w AS DOUBLE)" }
                      .mkString("CASE ", " ", " ELSE CAST(0.0 AS DOUBLE) END")})
         |               * CAST($MixWeightedBudget AS DOUBLE) / total_tokens) AS rate
         |  FROM tot),
         |thr AS (
         |  SELECT *, CASE WHEN rate >= 1.0 THEN 'g'
         |                 ELSE printf('%08x', CAST(floor(LEAST(rate * 4294967296.0, 4294967295.0)) AS BIGINT))
         |            END AS h_thr
         |  FROM r)
         |SELECT t.source, n_docs_total, total_tokens, weight,
         |       floor(rate * 1e6 + 0.5) / 1e6 AS rate,
         |       COUNT(CASE WHEN substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < h_thr THEN 1 END) AS n_docs_kept,
         |       CAST(COALESCE(SUM(CASE WHEN substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < h_thr THEN t.n_tokens END), 0) AS BIGINT) AS kept_tokens
         |FROM t JOIN thr ON t.source = thr.source
         |GROUP BY 1, 2, 3, 4, 5 ORDER BY t.source"""
    ) { (s, d) =>
      graft.GraftOps.sourceMixWeighted(
        Tables.documents(s, d), MixWeights, MixWeightedBudget)
    },

    // Temperature-flattened mixture (weights ∝ total^alpha, alpha=0.5):
    // the derived weight is a computed DOUBLE, so the whole chain rides
    // the determinism discipline — sqrt (IEEE-exact both engines, never
    // pow's libm), round6'd powered totals, exact decimal normalizer —
    // making weight/rate/threshold bit-identical cross-engine.
    Q(
      "q_source_mix_temperature",
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($WordsSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |tot AS (
         |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |         COUNT(*) AS n_docs_total
         |  FROM t GROUP BY source),
         |p AS (
         |  SELECT *, floor(sqrt(CAST(total_tokens AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS pw
         |  FROM tot),
         |norm AS (
         |  SELECT CAST(SUM(CAST(pw AS DECIMAL(38,10))) AS DOUBLE) AS spw FROM p),
         |r AS (
         |  SELECT source, total_tokens, n_docs_total, pw / spw AS weight,
         |         CASE WHEN total_tokens > 0
         |              THEN LEAST(CAST(1.0 AS DOUBLE),
         |                         (pw / spw) * CAST($MixTemperatureBudget AS DOUBLE) / total_tokens)
         |              ELSE CAST(0.0 AS DOUBLE) END AS rate
         |  FROM p, norm),
         |thr AS (
         |  SELECT *, CASE WHEN rate >= 1.0 THEN 'g'
         |                 ELSE printf('%08x', CAST(floor(LEAST(rate * 4294967296.0, 4294967295.0)) AS BIGINT))
         |            END AS h_thr
         |  FROM r)
         |SELECT t.source, n_docs_total, total_tokens, weight,
         |       floor(rate * 1e6 + 0.5) / 1e6 AS rate,
         |       COUNT(CASE WHEN substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < h_thr THEN 1 END) AS n_docs_kept,
         |       CAST(COALESCE(SUM(CASE WHEN substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < h_thr THEN t.n_tokens END), 0) AS BIGINT) AS kept_tokens
         |FROM t JOIN thr ON t.source = thr.source
         |GROUP BY 1, 2, 3, 4, 5 ORDER BY t.source"""
    ) { (s, d) =>
      graft.GraftOps.sourceMixTemperature(
        Tables.documents(s, d), MixTemperatureAlpha, MixTemperatureBudget)
    }
  )
}
