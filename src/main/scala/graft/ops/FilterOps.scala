package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Rule-based document filtering and corpus-level text rewriting — the
  * classic pretraining-curation batteries:
  *
  *  - Gopher quality rules (Rae et al. 2021 §A1.1): the word/line-ratio
  *    rule list (word-count bounds, mean word length, alphabetic-word
  *    ratio, required stopwords, symbol ratio, bullet/ellipsis line
  *    ratios) every web-scale pipeline screens with before anything
  *    model-based runs.
  *  - C4-style line cleaning (Raffel et al. 2020 §2.2): keep only lines
  *    that end in terminal punctuation and carry >= 3 words; flag
  *    documents with code braces or placeholder text.
  *  - Boilerplate stripping: lines whose content recurs across >=
  *    `minDocs` distinct documents (headers, footers, nav chrome) are
  *    removed corpus-wide and the documents rebuilt — the CCNet
  *    paragraph-frequency discipline, here at line granularity.
  *  - Perplexity-gated filtering (CCNet, Wenzek et al. 2020): score
  *    every document with the corpus bigram LM ([[PipelineOps
  *    .bigramLogProb]]), decile the scores two-phase (no single-task
  *    window), keep everything above the worst deciles.
  *
  * The fixture corpus is a newline-free word soup (TESTDATA.md), so the
  * line-structured input is DERIVED in-plan — 4-token lines, a
  * deterministic terminal-punctuation suffix keyed on (doc_id, line) —
  * by the IDENTICAL expression on both engines (the q_pii_scrub
  * dirty-column pattern, CurationOps.scala:68): the oracle checks the
  * operators, not the synthesis. Every rule compares in exact integer
  * arithmetic (`3·n <= sum && sum <= 10·n`, never `avg ∈ [3,10]` in
  * doubles), so no rounding policy is even needed on the rule path.
  *
  * Scale shapes: Gopher rules and C4 cleaning are fully narrow
  * single-pass projections (regex + list work inside whole-stage
  * codegen; the only exchange is the presentation sort). Boilerplate
  * stripping exchanges (digest, doc_id) pairs for the frequency table —
  * 16-byte keys, the q_repeated_spans discipline — then rebuilds with
  * one doc_id-keyed aggregation carrying the kept corpus once (the
  * honest floor for any corpus rewrite); the tiny frequent-line table
  * joins back as a broadcast anti-join. Perplexity gating rides the
  * bigram LM's shapes plus the two-phase decile recipe
  * ([[PipelineOps.valueDeciles]]) — partial ranks inside value buckets,
  * bucket offsets broadcast back, nothing funnels through one task.
  */
object FilterOps extends QueryModule {
  import TextOps.{WordsSql, WsReDuck}

  // ------------------------------------------------------------------
  // Shared derived line structure (fixture has no newlines)
  // ------------------------------------------------------------------

  private val LineTok = 4

  /** 4-token lines joined by '\n'; line i gets suffix '' / '.' / '!' by
    * (doc_id + i) % 3 — deterministic, identical on both engines. One
    * fused tokenize + build pass ([[graft.functions.SuffixLines]]; the
    * transform/slice/concat lambda chain this replaces was the larger
    * half of the rule queries' runtime, and builtin parity is
    * property-checked in FilterExprsSpec).
    */
  private def ltextCol: Column =
    graft.functions.GraftFunctions.suffix_lines(
      col("text"), col("doc_id"), LineTok)

  /** DuckDB spelling of [[ltextCol]] over a CTE exposing (doc_id, ws).
    * Single line on purpose: interpolated into stripMargin oracles, a
    * continuation line starting with `||` would lose its first `|`
    * (the CurationOps.PiiTextSql lesson).
    */
  private val LtextSql: String =
    s"array_to_string(list_transform(range(0, CAST(ceil(len(ws) / $LineTok.0) AS INT)), " +
      s"i -> array_to_string(list_slice(ws, CAST(i*$LineTok+1 AS INT), CAST(i*$LineTok+$LineTok AS INT)), ' ') " +
      s"|| (['', '.', '!'])[CAST((doc_id + i) % 3 AS INT) + 1]), chr(10))"

  /** Oracle-side tokenizer over an arbitrary string expression. */
  private def wordsSqlOf(e: String): String =
    s"list_filter(regexp_split_to_array($e, '$WsReDuck'), x -> x <> '')"

  /** The derived line-structured input for the narrow rule queries,
    * presentation ordering is the CALLER's problem: a global
    * `orderBy("doc_id")` over a corpus-scale narrow pipeline
    * re-executes the whole pipeline in the boundary-sampling pass (the
    * measured 2x on q_gopher_rules / q_c4_clean), so both registered
    * queries checkpoint their battery rows first and sort those (r11;
    * q_c4_clean's earlier exchange-raw-rows-first spelling was
    * re-A/B'd and lost to the checkpoint — PLANS.md r11) — the only
    * text crossing an exchange is q_c4_clean's rebuilt OUTPUT through
    * its presentation sort.
    */
  private[graft] def derivedLines(docs: DataFrame): DataFrame =
    docs
      .filter(TextOps.wordCount(col("text")) >= 1)
      .select(col("doc_id"), ltextCol.as("ltext"))

  // ------------------------------------------------------------------
  // Gopher quality rules
  // ------------------------------------------------------------------

  /** Per-document Gopher rule battery over `textCol` (line rules split
    * on '\n'). Every rule is an exact integer comparison; output keeps
    * the raw counts so downstream thresholds can be re-derived without
    * a second corpus pass. Fully narrow: all nine counters come from
    * ONE fused codegen pass ([[graft.functions.GopherStats]] — the
    * builtins spelling is ~10 interpreted lambda passes per document;
    * builtin parity is property-checked in FilterExprsSpec), and
    * codegen subexpression elimination dedups the struct-field reads.
    */
  def gopherRules(
      df: DataFrame, textCol: String = "text",
      minWords: Long = 50, maxWords: Long = 100000): DataFrame = {
    val st = graft.functions.GraftFunctions.gopher_stats(col(textCol))
    df.select(
        col("doc_id"),
        st.getField("n_words").as("n_words"),
        st.getField("n_lines").as("n_lines"),
        st.getField("sum_wlen").as("sum_wlen"),
        st.getField("n_alpha").as("n_alpha"),
        st.getField("n_stop").as("n_stop"),
        st.getField("n_hash").as("n_hash"),
        st.getField("n_dots").as("n_dots"),
        st.getField("n_bullet").as("n_bullet"),
        st.getField("n_ell").as("n_ell"))
      .withColumn("r_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_wlen",
        lit(3L) * col("n_words") <= col("sum_wlen") &&
          col("sum_wlen") <= lit(10L) * col("n_words"))
      .withColumn("r_alpha", lit(5L) * col("n_alpha") > lit(4L) * col("n_words"))
      .withColumn("r_stop", col("n_stop") >= 2L)
      .withColumn("r_sym",
        lit(10L) * (col("n_hash") + col("n_dots")) < col("n_words"))
      .withColumn("r_bullet", lit(10L) * col("n_bullet") <= lit(9L) * col("n_lines"))
      .withColumn("r_ell", lit(10L) * col("n_ell") <= lit(3L) * col("n_lines"))
      .withColumn("keep",
        col("r_words") && col("r_wlen") && col("r_alpha") && col("r_stop") &&
          col("r_sym") && col("r_bullet") && col("r_ell"))
    // no presentation sort here: the battery is fully narrow, so it
    // applies to an unbounded stream unchanged (StreamingSpec pins
    // that); the registered query adds its own total order
  }

  // ------------------------------------------------------------------
  // C4-style line cleaning
  // ------------------------------------------------------------------

  /** C4 line filter over `textCol`: keep lines ending in terminal
    * punctuation with >= `minLineWords` words; document-level flags for
    * code braces and placeholder text. Output carries the cleaned text
    * (kept lines re-joined) plus counts. Fully narrow.
    */
  def c4Clean(
      df: DataFrame, textCol: String = "text",
      minLineWords: Int = 3): DataFrame = {
    val t = col(textCol)
    // line filter + rebuild fused into one codegen pass (the builtins
    // spelling re-tokenizes every line through interpreted lambdas);
    // builtin parity property-checked in FilterExprsSpec
    val st = graft.functions.GraftFunctions.c4_stats(t, minLineWords)
    df.select(
        col("doc_id"),
        st.getField("n_lines").as("n_lines"),
        st.getField("n_kept").as("n_kept"),
        (!t.contains("{") && !lower(t).contains("lorem ipsum")).as("doc_ok"),
        st.getField("cleaned").as("cleaned"))
      .withColumn("kept_frac",
        Exact.round6(col("n_kept").cast("double") / col("n_lines")))
      .withColumn("keep", col("doc_ok") && col("n_kept") >= 1L)
      .select("doc_id", "n_lines", "n_kept", "kept_frac", "keep", "cleaned")
    // no presentation sort (stream-applicable; the query adds it)
  }

  // ------------------------------------------------------------------
  // Corpus-frequency boilerplate stripping
  // ------------------------------------------------------------------

  /** Cap for collecting the boiler-line digest set into the driver
    * (the [[TrainPrepOps.MaxLiteralDomains]] discipline: 2M hex
    * digests ≈ 160 MB of driver strings, the knnLabel bound).
    */
  val MaxLiteralBoilerLines = 2000000L

  /** The literal path's fused strip frame — package-visible so the
    * plan-hygiene spec can pin the graft_boiler_strip expression on the
    * OPERATOR plan (the registered query checkpoints it away, the
    * gopherRules precedent).
    */
  private[graft] def boilerProbeFrame(
      withWords: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.StrSet],
      lineTokens: Int): DataFrame = {
    val st = org.apache.spark.sql.GraftBridge.column(
      graft.functions.BoilerStrip(
        org.apache.spark.sql.GraftBridge.expression(col("text")),
        bc, lineTokens))
    withWords
      .select(col("doc_id"), st.as("st"))
      .select(
        col("doc_id"),
        col("st.n_lines").as("n_lines"),
        col("st.n_boiler").as("n_boiler"),
        col("st.cleaned").as("cleaned"))
  }

  /** Remove every line whose content occurs in >= `minDocs` DISTINCT
    * documents anywhere in the corpus, and rebuild each document from
    * its surviving lines in order. Lines are `lineTokens`-token windows
    * (the [[CurationOps.lineDupStats]] segmentation; a newline corpus
    * would split instead). Output: (doc_id, n_lines, n_boiler, cleaned)
    * — a fully-stripped document survives with cleaned = ''.
    *
    * Scale (r11, literal-first): the frequency pass exchanges (hex
    * digest, doc_id) pairs only and aggregates to the frequent-line
    * set. Under [[MaxLiteralBoilerLines]] that set rides back as a
    * broadcast [[graft.functions.StrSet]] probed by ONE fused
    * graft_boiler_strip codegen pass over the documents — no line
    * table ever materializes, no line-level join forms, and the only
    * text the query moves is the REBUILT output crossing its
    * presentation sort (the q_c4_clean shape). Past the cap, the join
    * spelling remains — the SAME fused frequency plan feeding a
    * size-honest flag join (its one re-execution is a scan, never the
    * countDistinct expand+distinct respell), then ONE doc_id-keyed
    * rebuild aggregation whose range exchange is the operator's one
    * corpus-text move — the honest floor for a line-level rewrite
    * whose frequent set outgrows the driver. A fully-stripped document
    * stays in the output with cleaned = '' on both paths (dual-path
    * equality spec'd).
    */
  def boilerplateStrip(
      docs: DataFrame, lineTokens: Int = LineTok,
      minDocs: Int = 2,
      maxLiteralBoiler: Long = MaxLiteralBoilerLines): DataFrame = {
    val withWords = docs.filter(TextOps.wordCount(col("text")) >= 1)
    // ONE frequency spelling for both paths: a fused scan emits each
    // document's DISTINCT line digests (graft_line_digests), so
    // doc-frequency is a plain map-side-combinable count — the
    // countDistinct spelling's expand + distinct shuffle was this
    // pass's measured hotspot (855 -> 303 ms at sf0.1).
    val freq = withWords
      .select(explode(org.apache.spark.sql.GraftBridge.column(
        graft.functions.LineDigests(
          org.apache.spark.sql.GraftBridge.expression(col("text")),
          lineTokens))).as("dg"))
      .groupBy("dg")
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("dg")
    if (maxLiteralBoiler > 0) {
      val probe = TinyLoop.boundedCollect(freq, maxLiteralBoiler)
      if (probe.length <= maxLiteralBoiler) {
        val hs = new java.util.HashSet[String](probe.length * 2)
        probe.foreach(r => hs.add(r.getString(0)))
        val bc = docs.sparkSession.sparkContext.broadcast(
          new graft.functions.StrSet(hs))
        // Checkpoint BEFORE the presentation sort (the gopherRules
        // pattern): a global orderBy range-partitions, and the range
        // sampler executes its child lineage a second time — without
        // the checkpoint the whole fused strip scan (tokenize + md5
        // over the corpus) runs twice just to pick sort bounds.
        return TinyLoop.corpusCheckpoint(boilerProbeFrame(withWords, bc, lineTokens))
          .orderBy("doc_id")
      }
    }
    // Join path (frequent set past the driver cap): the frequent set
    // rides the SAME fused `freq` plan into the flag join (hex -> the
    // line table's 16-byte binary key), and the line table is consumed
    // exactly once, so nothing needs materializing. On literal-probe
    // overflow this re-executes the frequency SCAN — the collect
    // already shipped its result to the driver, where it cannot be
    // reused as a frame — but never the expand+distinct respell.
    val boiler = freq
      .select(unhex(col("dg")).as("dg"), lit(true).as("is_boiler"))
    val lines = withWords
      .select(
        col("doc_id"),
        posexplode(graft.functions.GraftFunctions.token_lines(
          col("text"), lineTokens)))
      .toDF("doc_id", "pos", "line")
      .withColumn("dg", unhex(md5(col("line"))))
    lines
      .join(boiler, Seq("dg"), "left")
      // RANGE-partition on doc_id up front (the q_window_moving move):
      // it satisfies the rebuild aggregation's ClusteredDistribution,
      // and because the presentation ORDER BY is doc_id, the final sort
      // is LOCAL — the old plan re-exchanged the AGGREGATED output
      // (doc_id + the full rebuilt `cleaned` text, the heaviest column
      // in the query) through a second full shuffle + boundary-sampling
      // pass just to order it.
      .repartitionByRange(col("doc_id"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_boiler").isNull, struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          " ").as("cleaned"))
      .select("doc_id", "n_lines", "n_boiler", "cleaned")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Global first-occurrence line dedup (CCNet/RefinedWeb rebuild)
  // ------------------------------------------------------------------

  /** Cap for the literal winner map (duplicated-line digests + their
    * first occurrence): each entry is a 32-char digest String plus a
    * HashMap node plus an Array[Long](2) — ~150-180 B on-heap — so 2M
    * entries is a realistic 300-400 MB of driver state before the
    * torrent broadcast copies (NOT the ~250 MB a bytes-only estimate
    * suggests; tune against driver memory from the larger number).
    * The [[MaxLiteralBoilerLines]] discipline. Past it, the join
    * spelling takes over.
    */
  val MaxLiteralDupLines = 2000000L

  /** The literal path's fused strip frame — package-visible so the
    * plan-hygiene spec can pin the graft_first_line_strip expression on
    * the OPERATOR plan (the boilerProbeFrame precedent).
    */
  private[graft] def firstStripFrame(
      withWords: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.WinnerMap],
      lineTokens: Int): DataFrame = {
    val st = org.apache.spark.sql.GraftBridge.column(
      graft.functions.FirstLineStrip(
        org.apache.spark.sql.GraftBridge.expression(col("text")),
        org.apache.spark.sql.GraftBridge.expression(col("doc_id")),
        bc, lineTokens))
    withWords
      .select(col("doc_id"), st.as("st"))
      .select(
        col("doc_id"),
        col("st.n_lines").as("n_lines"),
        col("st.n_dropped").as("n_dropped"),
        col("st.cleaned").as("cleaned"))
  }

  /** Remove every occurrence of a duplicated line except the
    * corpus-wide FIRST (ordered by (doc_id, pos)) and rebuild each
    * document from its surviving lines in order — the CCNet/RefinedWeb
    * "keep one copy" rewrite, [[boilerplateStrip]]'s positional sibling
    * (boilerplate drops frequent lines EVERYWHERE; this keeps exactly
    * one). Lines are `lineTokens`-token windows. Output: (doc_id,
    * n_lines, n_dropped, cleaned); a fully-deduplicated document
    * survives with cleaned = ''.
    *
    * Scale: the winner pass exchanges (hex digest, doc_id, pos)
    * triples through ONE map-side-combinable min/count aggregation —
    * text never moves. Under [[MaxLiteralDupLines]] the duplicated-line
    * winners ride back as a broadcast [[graft.functions.WinnerMap]]
    * probed by ONE fused graft_first_line_strip codegen pass (keep =
    * absent OR this occurrence IS the winner); past the cap, the same
    * winner frame feeds a digest-keyed flag join over the exploded
    * lines, then one doc_id-keyed rebuild aggregation — the honest
    * floor for a line-level rewrite whose duplicate set outgrows the
    * driver. Dual-path equality is spec'd (FilterOpsSpec).
    *
    * STREAMING RECIPE (batch form is corpus-relative — the winner is
    * the GLOBAL first occurrence — so it cannot run verbatim on an
    * unbounded stream; StreamingSpec pins the exact composition): per
    * micro-batch, run THIS operator for within-batch first occurrence,
    * then strip lines seen in earlier batches via the boiler probe
    * against accumulated digest state, then append the survivors'
    * digests to the state. Line windows are exactly `lineTokens`
    * tokens (only a document's final line may be short), so the
    * rebuilt text re-windows identically and the composition equals
    * the batch operator over the union.
    */
  def firstLineDedup(
      docs: DataFrame, lineTokens: Int = LineTok,
      maxLiteralWinners: Long = MaxLiteralDupLines): DataFrame = {
    val withWords = docs.filter(TextOps.wordCount(col("text")) >= 1)
    // ONE winner spelling for both paths: per-position digests from a
    // fused scan (graft_line_digest_seq), min(struct(doc_id, pos)) +
    // count per digest, duplicated digests only.
    val winners = withWords
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.line_digest_seq(
          col("text"), lineTokens)))
      .toDF("doc_id", "pos", "dg")
      .groupBy("dg")
      .agg(
        min(struct(col("doc_id"), col("pos").cast("long").as("pos"))).as("w"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("dg"), col("w.doc_id").as("wdoc"), col("w.pos").as("wpos"))
    if (maxLiteralWinners > 0) {
      val probe = TinyLoop.boundedCollect(winners, maxLiteralWinners)
      if (probe.length <= maxLiteralWinners) {
        val hm = new java.util.HashMap[String, Array[Long]](probe.length * 2)
        probe.foreach(r =>
          hm.put(r.getString(0), Array(r.getLong(1), r.getLong(2))))
        val bc = docs.sparkSession.sparkContext.broadcast(
          new graft.functions.WinnerMap(hm))
        // checkpoint before the presentation sort (the boilerplateStrip
        // pattern): the fused strip scan runs once, not once more per
        // sort-sampling pass
        return TinyLoop.corpusCheckpoint(
          firstStripFrame(withWords, bc, lineTokens)).orderBy("doc_id")
      }
    }
    // Join path (winner set past the driver cap): digest-keyed flag
    // join over the exploded lines, keep = no winner (unique line) or
    // this occurrence is it, then the boilerplateStrip rebuild shape
    // (range-partition on doc_id up front so the final doc_id sort is
    // local).
    val lines = withWords
      .select(
        col("doc_id"),
        posexplode(graft.functions.GraftFunctions.token_lines(
          col("text"), lineTokens)))
      .toDF("doc_id", "pos", "line")
      .withColumn("dg", md5(col("line")))
    lines
      .join(winners, Seq("dg"), "left")
      .withColumn("keep",
        col("wdoc").isNull ||
          (col("wdoc") === col("doc_id") && col("wpos") === col("pos")))
      .repartitionByRange(col("doc_id"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          " ").as("cleaned"))
      .select("doc_id", "n_lines", "n_dropped", "cleaned")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Perplexity-gated filtering (CCNet)
  // ------------------------------------------------------------------

  /** Score every document with the corpus bigram LM, decile the scores,
    * keep documents at or above `keepFromDecile` (decile 10 = highest
    * avg log-probability = lowest perplexity; CCNet's head/middle cut).
    * The decile is computed two-phase over an exact integer image of
    * the rounded score (`floor(avg_logprob·1e6 + 0.5)` — the +0.5
    * absorbs the ulp of re-scaling a round6'd double, so the long is
    * exact on both engines), value-bucketed so no single-task window
    * appears at any corpus size. Inherits [[PipelineOps.bigramLogProb]]
    * eagerness (model-state construction at call time).
    *
    * STREAMING RECIPE (the one curation operator whose batch form is
    * corpus-relative — LM probabilities AND decile cutoffs are corpus
    * statistics — so it cannot run verbatim on an unbounded stream;
    * this contract pins how it runs instead, spec'd in StreamingSpec):
    *
    *  1. Train on a REFERENCE corpus, batch:
    *     `lm = PipelineOps.bigramLmTable(refDocs)` and freeze the
    *     logprob cutoff for the kept deciles from
    *     `perplexityFilter(refDocs)` — both are MODEL STATE.
    *  2. Score each micro-batch inside `foreachBatch`:
    *     `PipelineOps.scoreBigramLm(batch, lm)` (narrow explode +
    *     broadcast LM join + one doc-keyed agg — stateless per batch),
    *     then gate on `avg_logprob >= frozenCutoff`. Documents with no
    *     LM-known bigram yield no score row — route them by policy.
    *  3. REFRESH periodically: retrain `lm` (and the cutoff) on the
    *     accumulated/recent corpus outside the stream and swap the
    *     reference the foreachBatch closure reads — the stream picks
    *     up the new broadcast on its next batch; no restart.
    */
  def perplexityFilter(docs: DataFrame, keepFromDecile: Int = 4): DataFrame = {
    val scored = PipelineOps.bigramLogProb(docs)
      .withColumn("lp_micro",
        floor(col("avg_logprob") * 1e6 + lit(0.5)).cast("long"))
    // Materialize the SCORED frame once (narrow per-doc rows — exactly
    // what a production gate persists between scoring and bucketing) —
    // but ONLY when the LM took the literal path: there scoring is a
    // narrow LmArrayScore projection, and valueDeciles' two reads
    // (bucket histogram + in-bucket rank) would re-run the whole
    // probe pass twice with nothing for AQE to dedup. On that path the
    // materialization is valueDecilesObserved's: the bucket histogram
    // rides the SAME job that checkpoints the scored rows (r13 — the
    // checkpoint-then-collect spelling paid a second full plan+job for
    // a sub-1000-row histogram). Under the distributed path the
    // scoring subtree ends in a doc-keyed aggregation exchange that
    // both reads already share via ReusedExchange — a checkpoint there
    // only adds a full extra materialization (measured +5s at the
    // 100x-mutate datapoint, where the vocabulary blow-up forces the
    // distributed LM).
    val literalLm = scored.queryExecution.analyzed.exists(
      _.expressions.exists(_.exists(e =>
        e.isInstanceOf[graft.functions.LmArrayScore] ||
          e.isInstanceOf[graft.functions.MapLp])))
    // the decile itself is the shared two-phase value-bucket recipe
    // (ONE implementation — q_quality_deciles rides the same code);
    // 0.1-logprob buckets keep the in-bucket window partitions
    // high-cardinality at any corpus size
    val deciled =
      if (literalLm) PipelineOps.valueDecilesObserved(scored, "lp_micro",
        "doc_id", bucketWidth = 100000,
        carryCols = Seq("n_bigrams", "avg_logprob"))
      else PipelineOps.valueDeciles(scored, "lp_micro", "doc_id",
        bucketWidth = 100000, carryCols = Seq("n_bigrams", "avg_logprob"))
    deciled
      .select(
        col("doc_id"), col("n_bigrams"), col("avg_logprob"),
        col("decile").cast("long").as("decile"),
        (col("decile") >= keepFromDecile).as("keep"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Registered queries
  // ------------------------------------------------------------------

  def queries: Seq[Q] = Seq(
    // Gopher rule battery over the derived line-structured corpus.
    Q(
      "q_gopher_rules",
      s"""WITH w0 AS (SELECT doc_id, $WordsSql AS ws FROM documents
         |            WHERE len($WordsSql) >= 1),
         |d AS (SELECT doc_id, $LtextSql AS ltext FROM w0),
         |s AS (SELECT doc_id,
         |             ${wordsSqlOf("ltext")} AS ws,
         |             string_split(ltext, chr(10)) AS lines,
         |             ltext
         |      FROM d),
         |m AS (SELECT doc_id,
         |             CAST(len(ws) AS BIGINT) AS n_words,
         |             CAST(len(lines) AS BIGINT) AS n_lines,
         |             CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS sum_wlen,
         |             CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         |             CAST(${TextOps.EnStop.map(s => s"(CASE WHEN list_contains(ws, '$s') THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT) AS n_stop,
         |             CAST(len(regexp_extract_all(ltext, '#')) AS BIGINT) AS n_hash,
         |             CAST(len(regexp_extract_all(ltext, '\\.\\.\\.')) AS BIGINT) AS n_dots,
         |             CAST(len(list_filter(lines, l -> starts_with(l, '- ') OR starts_with(l, '* ') OR starts_with(l, '• '))) AS BIGINT) AS n_bullet,
         |             CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS BIGINT) AS n_ell
         |      FROM s)
         |SELECT doc_id, n_words, n_lines, sum_wlen, n_alpha, n_stop, n_hash,
         |       n_dots, n_bullet, n_ell,
         |       n_words >= 50 AND n_words <= 100000 AS r_words,
         |       3*n_words <= sum_wlen AND sum_wlen <= 10*n_words AS r_wlen,
         |       5*n_alpha > 4*n_words AS r_alpha,
         |       n_stop >= 2 AS r_stop,
         |       10*(n_hash + n_dots) < n_words AS r_sym,
         |       10*n_bullet <= 9*n_lines AS r_bullet,
         |       10*n_ell <= 3*n_lines AS r_ell,
         |       (n_words >= 50 AND n_words <= 100000)
         |         AND (3*n_words <= sum_wlen AND sum_wlen <= 10*n_words)
         |         AND 5*n_alpha > 4*n_words AND n_stop >= 2
         |         AND 10*(n_hash + n_dots) < n_words
         |         AND 10*n_bullet <= 9*n_lines
         |         AND 10*n_ell <= 3*n_lines AS keep
         |FROM m ORDER BY doc_id"""
    ) { (s, d) =>
      // narrow output: checkpoint the battery rows, sort those — text
      // never shuffles (see derivedLines)
      TinyLoop.corpusCheckpoint(
        gopherRules(derivedLines(Tables.documents(s, d)), "ltext")
          .select("doc_id", "n_words", "n_lines", "sum_wlen", "n_alpha",
            "n_stop", "n_hash", "n_dots", "n_bullet", "n_ell", "r_words",
            "r_wlen", "r_alpha", "r_stop", "r_sym", "r_bullet", "r_ell", "keep"))
        .orderBy("doc_id")
    },

    // C4 line cleaning over the same derived corpus.
    Q(
      "q_c4_clean",
      s"""WITH w0 AS (SELECT doc_id, $WordsSql AS ws FROM documents
         |            WHERE len($WordsSql) >= 1),
         |d AS (SELECT doc_id, $LtextSql AS ltext FROM w0),
         |s AS (SELECT doc_id,
         |             string_split(ltext, chr(10)) AS lines,
         |             list_filter(string_split(ltext, chr(10)),
         |               l -> len(${wordsSqlOf("l")}) >= 3
         |                    AND regexp_matches(l, '[.!?]$$')) AS kept,
         |             NOT contains(ltext, '{')
         |               AND NOT contains(lower(ltext), 'lorem ipsum') AS doc_ok
         |      FROM d)
         |SELECT doc_id,
         |       CAST(len(lines) AS BIGINT) AS n_lines,
         |       CAST(len(kept) AS BIGINT) AS n_kept,
         |       floor(CAST(len(kept) AS DOUBLE) / len(lines) * 1e6 + 0.5) / 1e6 AS kept_frac,
         |       doc_ok AND len(kept) >= 1 AS keep,
         |       array_to_string(kept, chr(10)) AS cleaned
         |FROM s ORDER BY doc_id"""
    ) { (s, d) =>
      // checkpoint the cleaned rows, sort those (r11; replaces the
      // exchange-raw-rows-first spelling): the fused battery runs ONCE
      // into the checkpoint instead of once per sort-sampling pass,
      // and the only text crossing an exchange is the REBUILT output
      // through its presentation sort — A/B'd 0.61s vs 0.70s at sf0.1,
      // even (4.65 vs 4.55) at the 100x datapoint
      TinyLoop.corpusCheckpoint(
        c4Clean(derivedLines(Tables.documents(s, d)), "ltext"))
        .orderBy("doc_id")
    },

    // Corpus-frequency boilerplate stripping + rebuild.
    Q(
      "q_boilerplate_strip",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents
         |           WHERE len($WordsSql) >= 1),
         |l AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM (
         |        SELECT doc_id,
         |               unnest(list_transform(range(0, CAST(ceil(len(ws) / $LineTok.0) AS INT)),
         |                 i -> {'pos': i, 'line': array_to_string(list_slice(ws, CAST(i*$LineTok+1 AS INT), CAST(i*$LineTok+$LineTok AS INT)), ' ')})) AS u
         |        FROM w)),
         |b AS (SELECT md5(line) AS dg FROM l
         |      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
         |kept AS (SELECT doc_id, pos, line FROM l
         |         WHERE md5(line) NOT IN (SELECT dg FROM b)),
         |a AS (SELECT doc_id, COUNT(*) AS n_kept,
         |             string_agg(line, ' ' ORDER BY pos) AS cleaned
         |      FROM kept GROUP BY doc_id),
         |t AS (SELECT doc_id, COUNT(*) AS n_lines FROM l GROUP BY doc_id)
         |SELECT t.doc_id, t.n_lines,
         |       t.n_lines - COALESCE(a.n_kept, 0) AS n_boiler,
         |       COALESCE(a.cleaned, '') AS cleaned
         |FROM t LEFT JOIN a USING (doc_id) ORDER BY doc_id"""
    ) { (s, d) => boilerplateStrip(Tables.documents(s, d)) },

    // Global first-occurrence line dedup + rebuild (keep one copy).
    Q(
      "q_line_dedup_rebuild",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents
         |           WHERE len($WordsSql) >= 1),
         |l AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM (
         |        SELECT doc_id,
         |               unnest(list_transform(range(0, CAST(ceil(len(ws) / $LineTok.0) AS INT)),
         |                 i -> {'pos': i, 'line': array_to_string(list_slice(ws, CAST(i*$LineTok+1 AS INT), CAST(i*$LineTok+$LineTok AS INT)), ' ')})) AS u
         |        FROM w)),
         |k AS (SELECT doc_id, pos, line,
         |             ROW_NUMBER() OVER (PARTITION BY md5(line)
         |                                ORDER BY doc_id, pos) AS rn
         |      FROM l)
         |SELECT doc_id, COUNT(*) AS n_lines,
         |       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |       COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY pos), '') AS cleaned
         |FROM k GROUP BY doc_id ORDER BY doc_id"""
    ) { (s, d) => firstLineDedup(Tables.documents(s, d)) },

    // CCNet perplexity gate: bigram-LM score deciles, drop the worst 3.
    Q(
      "q_perplexity_filter",
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
         |  JOIN cuni cu ON p.w1 = cu.w1),
         |lp AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |              floor(CAST(SUM(CAST(lp AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
         |                AS avg_logprob
         |       FROM scored GROUP BY doc_id),
         |r AS (SELECT doc_id, n_bigrams, avg_logprob,
         |             ROW_NUMBER() OVER (
         |               ORDER BY CAST(floor(avg_logprob * 1e6 + 0.5) AS BIGINT), doc_id) AS grank,
         |             COUNT(*) OVER () AS n_total
         |      FROM lp)
         |SELECT doc_id, n_bigrams, avg_logprob,
         |       (grank - 1) * 10 // n_total + 1 AS decile,
         |       (grank - 1) * 10 // n_total + 1 >= 4 AS keep
         |FROM r ORDER BY doc_id"""
    ) { (s, d) => perplexityFilter(Tables.documents(s, d)) }
  )
}
