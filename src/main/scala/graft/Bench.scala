package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Locale-pinned fixed-point formatting for the bench JSON: the
    * f-interpolator formats with the JVM default locale, and a
    * comma-decimal locale (de_DE) would emit unparseable JSON.
    */
  private def fmt(v: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))

  /** Headline benchmark set: one representative query per operator
    * family (the driver contract times "headline queries"; the full
    * registered surface stays in Verify's correctness gate). Chosen to
    * cover scan/filter, every join shape that matters at scale, heavy
    * aggregation, windows, dedup/similarity/text pipelines, event
    * windows, formats, and the OCR flagship.
    *
    * Round-over-round comparability: round 3 ADDED four queries
    * (q_tpch_q13, q_tpch_q18, q_rank_global, q_corpus_curation) to the
    * round-2 set of 28, and round 4 ADDED five more
    * (q_repetition_signals, q_seq_pack, q_bloom_prefilter_join,
    * q_bigram_lm, and the q_pipeline_e2e composite), and round 5 ADDED
    * six (q_tpch_q5, q_tpch_q10, q_kmeans_embed, q_dedup_corpus,
    * q_oov_rate, q_bpe_merges), and round 6 ADDED three
    * (q_tpch_q21, q_tpch_q9, q_ann_ivf_trained), and round 7 ADDED
    * five (q_collocations, q_source_mix, q_repeated_spans,
    * q_dedup_source_overlap — the queries most recently rewritten for
    * scale, so the bench watches them for regression — plus the new
    * q_ann_ivf_nprobe), and round 8 ADDED three (q_semantic_dedup,
    * q_chunk_windows, q_source_mix_weighted — same rationale: the
    * queries most recently written for scale are the ones the bench
    * must watch — and later three curation queries: q_pii_scrub (the
    * regex-heaviest narrow pass), q_line_dedup (the digest-keyed
    * corpus-global exchange), q_quality_classifier (hashed-feature
    * scoring), and q_dsir_weights (histogram pass + narrow scoring)),
    * then four filter/rewrite queries: q_gopher_rules + q_c4_clean
    * (narrow rule batteries), q_boilerplate_strip (digest-keyed
    * frequency exchange + one-agg rebuild), q_perplexity_filter
    * (bigram LM + two-phase decile) —
    * compare totals per-query, not headline-sum to headline-sum.
    * Round 9 ADDED the four retrieval/scoring queries (q_bm25,
    * q_hybrid_rrf, q_contamination, q_inverted_index): the last
    * oracle-green family the bench didn't watch — a regression in the
    * BM25 corpus-stats pass or the RRF fuse was invisible to BENCH_r8 —
    * plus the new q_source_mix_temperature (most-recently-written
    * rule), and later the three training-prep queries
    * (q_trigram_backoff, q_shuffle_shards, q_domain_quality — new
    * operators enter the bench the round they are written), and later
    * q_dedup_incremental, q_url_blocklist, q_text_normalize,
    * q_split_leakage, q_image_neardup, q_corpus_diff,
    * q_quality_tradeoff, q_knn_label, and q_corpus_card (same rule).
    * 79 queries total from r9 on.
    *
    * ROUND 8 ALSO CHANGED THE MEASURED ACTION from count() to a
    * noop-sink write (see `run` below): count() let Catalyst prune
    * unreferenced output columns and cardinality-preserving joins, so
    * projection-heavy queries were under-measured — q_semantic_dedup's
    * count() plan contained NONE of its four joins. Round-8+ numbers
    * measure strictly more work than round-7 numbers for the affected
    * queries; the JSON line carries "action":"noop-write" so a reader
    * can tell which methodology produced it.
    */
  val Headline: Seq[String] = Seq(
    "q_scan_project", "q_filter_predicates",
    "q_join_inner", "q_join_broadcast", "q_join_left", "q_join_semi",
    "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q9", "q_tpch_q10",
    "q_tpch_q13", "q_tpch_q18", "q_tpch_q21",
    "q_bloom_prefilter_join",
    "q_agg_q1", "q_agg_countdistinct", "q_agg_rollup", "q_skew_salted",
    "q_window_topk", "q_window_moving", "q_rank_global",
    "q_sort_limit", "q_set_union_all",
    "word_count", "q_term_freq", "q_token_count", "q_corpus_curation",
    "q_corpus_card",
    "q_repetition_signals", "q_seq_pack", "q_bigram_lm", "q_bpe_merges",
    "q_pipeline_e2e", "q_collocations", "q_source_mix", "q_repeated_spans",
    "q_source_mix_weighted", "q_source_mix_temperature", "q_chunk_windows",
    "q_pii_scrub", "q_line_dedup", "q_quality_classifier", "q_dsir_weights",
    "q_url_blocklist", "q_text_normalize", "q_corpus_diff",
    "q_quality_tradeoff",
    "q_gopher_rules", "q_c4_clean", "q_boilerplate_strip",
    "q_perplexity_filter",
    "q_bm25", "q_hybrid_rrf", "q_contamination", "q_inverted_index",
    "q_trigram_backoff", "q_shuffle_shards", "q_domain_quality",
    "q_dedup_exact", "q_dedup_minhash_pairs", "q_dedup_simhash",
    "q_dedup_corpus", "q_dedup_source_overlap", "q_dedup_incremental",
    "q_split_leakage", "q_oov_rate",
    "q_similarity_topk", "q_ann_lsh", "q_kmeans_embed", "q_ann_ivf_trained",
    "q_ann_ivf_nprobe", "q_ann_ivf_search", "q_semantic_dedup", "q_knn_label",
    "q_events_tumbling", "q_events_session",
    "q_orc_roundtrip", "q_warc_roundtrip", "q_warc_fetch", "q_warc_pushdown",
    "q_warc_write", "q_warc_http", "q_warc_http_meta", "q_crawl_ingest",
    "q_warc_zstd_dict", "q_avro_roundtrip",
    "q_avro_evolution", "q_avro_logical", "q_ocr_pipeline", "q_image_neardup",
    "q_audio_wav",
    // r13: HTML->text extraction + WET + the runtime-filter fetch
    // spelling + the crawl->WET refinement composite + pushed COUNT(*)
    // (new operators enter the bench the round they are written)
    "q_html_extract", "q_html_main", "q_html_density",
    "q_warc_wet", "q_warc_fetch_rf", "q_wet_refine", "q_warc_count",
    // r14: the token-ID pipeline capstone (vocab export, id emission,
    // pack-and-write-id-shards) + block-level main-content scoring
    "q_bpe_vocab", "q_bpe_ids", "q_tokenize_pack", "q_html_blocks",
    "q_lang_id_hashed", "q_warc_trio", "q_warc_revisit", "q_crawl_update",
    // r14 late: global first-occurrence line dedup rebuild + tokenizer
    // decode roundtrip integrity + pack-efficiency report
    "q_line_dedup_rebuild", "q_bpe_roundtrip", "q_pack_stats",
    "q_quality_train",
    // r15: text→vector projection + dedup-by-meaning from raw text +
    // int8-quantized stored-index search with float rerank +
    // classifier threshold-calibration sweep
    "q_embed_from_text", "q_embed_dedup", "q_ann_ivf_i8", "q_quality_eval",
    // r15 late: the tokenizer rounds/compression calibration curve +
    // ANN retrieval from raw text (derived vectors → stored IVF index)
    "q_bpe_compression", "q_embed_search", "q_embed_contamination",
    // r16: arbitrary-length exact-substring dedup (ExactSubstr at
    // word-token granularity: rolling-digest count exchange + fused
    // strip/rebuild) + byte-level BPE with regex pre-tokenization
    // (lossless original-text decode)
    "q_substring_dedup", "q_bpe_bytes",
    // r16: image→embedding through the real decode path + multimodal
    // SemDeDup over the derived vectors with the DERIVED cell count +
    // the bucketed stored ANN index probe
    "q_image_embed", "q_image_semdedup", "q_ann_ivf_bucketed",
    "q_image_search",
    // r16 late: audio→embedding through the real WAV decode path +
    // audio SemDeDup completing the three-modality ring over the one
    // shared dedup operator
    "q_audio_embed", "q_audio_semdedup",
    // r16: incremental semantic admission — a new vector batch judged
    // against a stored corpus codebook + cell index, the streaming
    // SemDeDup shape (corpus never re-compares to itself)
    "q_semantic_admission",
    // r16: quality-aware near-dedup — cluster keeper chosen by the
    // quality blend instead of arrival id (13/27 fixture clusters swap)
    "q_dedup_keep_best",
    // r16: per-domain cap — the crawl anti-flood rule (best `cap` docs
    // per domain by quality; narrow ranking window, no text exchange)
    "q_domain_cap",
    // r16: product quantization + ADC — 8-byte codes, per-block
    // codebooks, table-lookup scoring (the memory-bound ANN path) +
    // the IVF-PQ composition (cell-bounded candidates, ADC scoring)
    "q_ann_pq", "q_ann_ivf_pq")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // AQE partition-coalescing mode, env-parameterised (one-flag A/B;
      // production note in OPTIMIZATION_r17.md). Default TRUE = Spark's
      // default, kept after a measured two-window A/B at sf0.1:
      // parallelismFirst=false (coalesce to advisoryPartitionSizeInBytes
      // — the Spark tuning docs' recommendation for real clusters, and
      // the right 100 TB setting) collapses every 1-10 MB exchange to
      // ONE post-shuffle partition at this SF, serializing the
      // compute-bearing reduce stages (q_tokenize_pack +0.33s,
      // q_image_semdedup +0.23s, q_ann_ivf_i8 +0.16s) for no stable win
      // elsewhere — the r16 8-core-beats-32-core pathology turned out to
      // be per-job/task scheduling floor (fixed by cutting job counts,
      // e.g. the nearDupComponents union-find), NOT reduce-partition
      // counts, which AQE's 1 MB-floor target already coalesces to 1-2
      // at this scale under either setting.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      // ContextCleaner only reclaims finished broadcasts / shuffle files
      // after their driver-side handles are GC'd. Under a very large heap
      // the JVM may not GC for the whole run, so stale shuffle state (and
      // RSS) grows monotonically and starves the OS page cache — tighten
      // the periodic-GC fallback from its 30min default.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // AQE stays ON even at bench scale: a clean same-window A/B over the
    // full headline (r10) read AQE-off as +10.5s suite-wide — runtime
    // partition coalescing and broadcast conversion buy more than the
    // per-query-stage job materialization costs, even at sf0.1 on
    // local[4]. (Model-state loops still scope it off via TinyLoop,
    // where the loop-job arithmetic is different.)
    // Steady-state measurement: one full unmeasured warmup pass (JIT
    // compilation of generated code, parquet footer/page cache, shuffle
    // machinery), then per query THREE CONSECUTIVE measured runs
    // reporting the MIN plus the relative spread ((max-min)/min) — the
    // spread column separates genuine regressions from sandbox
    // co-tenancy noise, and under the consecutive protocol it also
    // absorbs the first run's re-warm cost (the min is what a warm
    // engine does; see the protocol note at the measurement loop).
    spark.range(1000).selectExpr("sum(id)").collect()
    // Dev-loop subset (comma-separated query names); the driver never
    // sets it, so official runs always time the full headline.
    val subset = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = subset.fold(Headline)(s => Headline.filter(s))
    val headline = names.map(n => n -> SparkEntry.queries(n))
    // The measured action is a noop-sink WRITE, not count(): under
    // count() Catalyst prunes every column the count doesn't need —
    // eliminating unreferenced per-row projections (q_dedup_simhash's
    // signature, word_count's tokenization), presentation sorts, and
    // even cardinality-preserving joins (q_semantic_dedup's count()
    // plan drops ALL FOUR of its joins: 54 executed-plan lines → 9).
    // The noop sink materializes every output column — the same work
    // the DuckDB yardstick's fetchall() pays — while writing nothing.
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    headline.foreach { case (name, fn) =>
      try run(fn)
      catch { case e: Throwable =>
        System.err.println(s"[bench-warmup] $name FAILED: ${e.getMessage}") }
    }
    // Measurement protocol (r10): warm min-of-3, CONSECUTIVE per query —
    // exactly the DuckDB yardstick's protocol (duckdb_bench.py runs each
    // statement's warm+measured executions back to back). The previous
    // interleaved-pass spelling put each query's three runs 79 queries
    // apart, so its min never saw a consecutively-warm execution while
    // the yardstick's always did — measured +25-50% per query on this
    // box from nothing but cross-query cache/JIT pollution, i.e. the two
    // engines were being measured under different protocols. Round-over-
    // round comparability: r10+ numbers are strictly the same work under
    // the aligned protocol; the JSON carries "protocol" so a reader can
    // tell which methodology produced it.
    // Spread-aware re-runs (r11): a min-of-3 whose relative spread
    // ((max-min)/min) exceeds 0.5 AND whose absolute spread exceeds
    // 0.3s was measured during a co-tenancy burst — the q_dedup_simhash
    // r10 artifact read 2.69s on the driver and 0.46s for the judge on
    // IDENTICAL code. One extra 3-run round with the overall min kills
    // that class of single-query weather before round-over-round triage
    // chases it; the JSON's "reruns" list records when the logic
    // engaged. The absolute floor matters: on a 100ms query ±60ms of
    // ordinary jitter clears the relative bar alone (a first full-suite
    // run re-ran 49 of 80 queries, +60% suite wall for values the min
    // already had right), while the artifact class this targets is
    // seconds-scale.
    val SpreadRerunThreshold = 0.5
    val SpreadRerunFloorSec = 0.3
    // Floor-vs-data decomposition (r12, per the r11 verdict): with 80+
    // queries the fixed per-query Spark driver floor (planning +
    // scheduling outside jobs) dominates the nominal total at sf0.1
    // (~0.4s/query), so the JSON now splits each accepted min run into
    // time spent INSIDE Spark jobs vs outside them. Jobs are recorded by
    // a listener using the EVENT timestamps (not delivery time — the bus
    // is async) and attributed to runs post-hoc by wall-clock window
    // overlap, so late delivery cannot mis-attribute. Measurement
    // transparency only — the measured wall values are unchanged.
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStarts.put(js.jobId, js.time); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(je.jobId)
        if (s != null) { jobLog.add((s.longValue(), je.time)); () }
      }
    })
    // one measured sample: (wallSec, windowStartMs, windowEndMs)
    def measure3(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Seq[(Double, Long, Long)] =
      (1 to 3).map { _ =>
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        try { run(fn) } catch {
          case e: Throwable =>
            // never corrupt the JSON line, but a failed query must be loud
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        ((System.nanoTime() - t0) / 1e9, w0, System.currentTimeMillis())
      }
    val results = headline.map { case (name, fn) =>
      // Untimed GC before each query's runs: keeps cleaner progress (and
      // therefore disk/memory footprint) flat across the suite instead
      // of letting it accumulate into the later queries' timings.
      System.gc()
      val first = measure3(name, fn)
      def wall(s: Seq[(Double, Long, Long)]) = s.map(_._1)
      val spread1 = (wall(first).max - wall(first).min) / wall(first).min
      val rerun = spread1 > SpreadRerunThreshold &&
        wall(first).max - wall(first).min > SpreadRerunFloorSec
      // the min spans ALL samples, but the reported spread is the
      // ACCEPTED round's (the re-run when it engaged): emitting the
      // burst round's spread would re-flag exactly the query the
      // re-run just cleaned
      val ts = if (rerun) measure3(name, fn) else first
      val best = (ts ++ first).minBy(_._1)
      (name, best._1, (wall(ts).max - wall(ts).min) / wall(ts).min, rerun, best._2, best._3)
    }
    val qs = results.map { case (k, v, _, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spreads = results
      .map { case (k, _, sp, _, _, _) => s"\"" + k + "\":" + math.round(sp * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    val reruns = results.collect { case (k, _, _, true, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // attribute job time to each accepted run by window overlap (clipped)
    val jobs = {
      import scala.jdk.CollectionConverters._
      jobLog.iterator().asScala.toVector
    }
    def jobSecIn(w0: Long, w1: Long): Double =
      jobs.iterator.map { case (s, e) =>
        math.max(0L, math.min(e, w1) - math.max(s, w0))
      }.sum / 1e3
    val jobSecs = results.map { case (k, _, _, _, w0, w1) => k -> jobSecIn(w0, w1) }
    val jobTotal = jobSecs.map(_._2).sum
    val floorTotal = total - jobTotal
    val jobsJson = jobSecs
      .map { case (k, s) => "\"" + k + "\":" + math.round(s * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    val decomp =
      s""""job_total":${fmt(jobTotal, 3)},"floor_total":${fmt(floorTotal, 3)}"""
    // Same-window DuckDB yardstick (r9): run the headline's oracle SQLs
    // in DuckDB immediately after the Spark passes, so the bench JSON
    // carries its own baseline — cross-window comparisons on this
    // co-tenanted sandbox have repeatedly mis-read 2x weather swings as
    // regressions (PLANS.md "sandbox weather"). DuckDB lives python-side
    // only, so shell out; ANY failure (no python, no duckdb module, a
    // hang) degrades to duckdb_total:null rather than corrupting the run.
    var duckdbJson: Option[String] = None
    val duckdbTotal: Option[Double] = try {
      val sqlDir = java.nio.file.Files.createTempDirectory("graft_bench_sqls")
      names.zipWithIndex.foreach { case (n, i) =>
        SparkEntry.oracleSql.get(n).foreach { sql =>
          java.nio.file.Files.write(
            sqlDir.resolve(f"$i%03d_$n.sql"),
            sql.getBytes("UTF-8")) // Q.apply already stripMargin'd
        }
      }
      val script = new java.io.File("/root/repo/tools/duckdb_bench.py")
      if (!script.isFile) None
      else {
        val proc = new ProcessBuilder(
          "python3", script.getAbsolutePath, sfDir, sqlDir.toString)
          .redirectErrorStream(false).start()
        val out = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        val finished = proc.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)
        if (!finished) { proc.destroyForcibly(); None }
        else {
          val line = Iterator.continually(out.readLine()).takeWhile(_ != null)
            .toSeq.lastOption.getOrElse("")
          // keep the script's whole JSON object (total + per-query map):
          // the per-query DuckDB times are what turn a cross-query ratio
          // analysis into same-window evidence
          if (line.startsWith("{") && line.endsWith("}")) duckdbJson = Some(line)
          """"duckdb_total":\s*([0-9.]+)""".r.findFirstMatchIn(line)
            .map(_.group(1).toDouble)
        }
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] duckdb yardstick unavailable: ${e.getMessage}")
      None
    }
    // q_wet_refine write/read split (r14, per the r13 verdict watch
    // note): the query's by-design WET write rides inside its measured
    // wall, so its nominal ratio against a read-only oracle is
    // uninterpretable on its own. Time the two halves separately
    // (warm min-of-3 each, same protocol) so the JSON carries the
    // decomposition. Skipped automatically when q_wet_refine is not in
    // the measured set (dev-loop subsets).
    val wetSplit: Option[(Double, Double)] =
      if (!names.contains("q_wet_refine")) None
      else try {
        def min3(f: () => Unit): Double =
          (1 to 3).map { _ =>
            val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
          }.min
        var out = ""
        val w = min3(() => out = graft.ops.ArchiveOps.wetRefineWrite(spark, sfDir))
        val r = min3(() => graft.ops.ArchiveOps.wetRefineRead(spark, out)
          .write.format("noop").mode("overwrite").save())
        Some((w, r))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] wet-refine split unavailable: ${e.getMessage}")
        None
      }
    val wetSplitJson = wetSplit
      .map { case (w, r) =>
        s""""wet_refine_split":{"write":${fmt(w, 3)},"read":${fmt(r, 3)}},""" }
      .getOrElse("")
    val duck = duckdbTotal.map(_.toString).getOrElse("null")
    val duckObj = duckdbJson.getOrElse("null")
    // Real-work split (r10, per the r9 judge brief): the suite-nominal
    // ratio mixes a fixed per-query Spark scheduling floor (invariant in
    // data size) into the 2x gate. Emit the subtotals over the queries
    // where DuckDB itself does >= 0.3s of data-plane work, so the
    // artifact separates plan quality from job-floor arithmetic without
    // a cross-file join.
    val duckPerQuery: Map[String, Double] = duckdbJson.map { js =>
      """"([A-Za-z0-9_]+)":\s*([0-9.]+)""".r.findAllMatchIn(js)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
    val realNames = names.filter(n => duckPerQuery.getOrElse(n, 0.0) >= 0.3)
    val realSpark = realNames.map(n => results.find(_._1 == n).get._2).sum
    val realDuck = realNames.map(duckPerQuery).sum
    val rw =
      s""""real_work_n":${realNames.size},""" +
      s""""real_work_spark":${fmt(realSpark, 4)},""" +
      s""""real_work_duckdb":${fmt(realDuck, 4)}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","action":"noop-write","protocol":"per-query-consecutive","duckdb_total":$duck,$rw,$decomp,$wetSplitJson"queries":$qs,"spread":$spreads,"reruns":$reruns,"job_sec":$jobsJson,"duckdb":$duckObj,"sf":"$sfDir"}""")
    // The full line above (per-query timings + spread map) exceeds the
    // driver's tail-capture window, so it can arrive truncated (round 6's
    // official total was lost that way: BENCH_r06 "parsed": null). Print a
    // short, final, self-contained summary line so the headline total
    // always survives tail truncation regardless of how many queries the
    // headline set grows to.
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","protocol":"per-query-consecutive","n":${results.size},"duckdb_total":$duck,$rw,$decomp,"n_reruns":${results.count(_._4)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
