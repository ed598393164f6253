package graft

import org.apache.spark.sql.functions._

/** Sweeping plan-shape guards over the entire registered surface — the
  * "would this plan survive 100×?" gate:
  *
  *  1. no query may plan an unintended CartesianProduct;
  *  2. no window may partition on a scale-fixed low-cardinality key
  *     (the o_orderstatus-style skew killer: at 100 TB every row funnels
  *     into as many tasks as the key has values);
  *  3. the headline bench queries must keep their load-bearing plan
  *     features: filters pushed into the parquet scan, dimension joins
  *     broadcast, pruned read schemas.
  */
class PlanHygieneSpec extends SparkSpec {

  // No allowlist: even the inherently cross/non-equi queries (theta,
  // similarity, fuzzy) must plan as broadcast joins, never cartesian.
  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.all.flatMap { q =>
      try {
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(q.name) else None
      } catch {
        case e: Throwable => Some(s"${q.name} (plan failed: ${e.getMessage.take(80)})")
      }
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  // The text-never-shuffles invariant as a CI gate (r11, promoted from
  // the TextShuffleScan dev tool): at 100 TB the text payload dominates
  // every table's byte size, so ONE accidental exchange carrying a
  // text-like column multiplies a query's shuffle bytes by the corpus
  // size. The r10 audit caught exactly this class three times (DSIR,
  // hashedQuality, q_gopher_rules — each had a narrow-checkpoint
  // alternative); this sweep pins the zero-hit end state at sf0.01.
  //
  // Caveat, documented here because the assert is plan-shape, not
  // semantics: the invariant is PLAN-dependent. dedupExact's payload
  // semi join probes a BROADCAST keeper set at these SFs; past
  // broadcast range the payload (text included) crosses its one
  // documented exchange by design, and that is correct — the audit's
  // value is catching ACCIDENTAL text exchanges that have narrow
  // alternatives, not banning every conceivable text movement.
  test("no registered query shuffles a text-like column") {
    val sf01 = "/root/testdata/sf0.01"
    // Deliberate mid-plan text moves only (keep this list tiny — every
    // entry needs a documented justification):
    //  - q_dedup_exact / q_dedup_corpus: keep-one-row-per-key dedup
    //    moves the payload (text included) to its keeper through the
    //    hinted shuffled-hash semi join — the operator's ONE documented
    //    exchange, deliberately broadcast-free (the keeper set outgrows
    //    broadcast exactly at scale; GraftOps.dedupExact scaladoc).
    // Presentation sorts of output text are exempted by the walker
    // itself (TextShuffleAudit), not listed here.
    //  - q_dedup_keep_best: same materialization class — the surviving
    //    payload meets its per-doc verdict through ONE doc-keyed join
    //    against the checkpointed narrow flags frame (broadcast in
    //    practice; past broadcast range the text crosses that one
    //    documented exchange, exactly the q_dedup_corpus trade).
    val allow = Set("q_dedup_exact", "q_dedup_corpus", "q_dedup_keep_best")
    val offenders = SparkEntry.all.flatMap { q =>
      if (allow(q.name)) None
      else try {
        val hits = plans.TextShuffleAudit.offendingExchanges(q.fn(spark, sf01))
        if (hits.nonEmpty) Some(s"${q.name}: text-carrying exchange over " +
          s"[${hits.mkString("; ")}] — score/flag into a narrow checkpointed " +
          "frame before the wide step (the DSIR/hashedQuality r10 fix)")
        else None
      } catch {
        case e: Throwable => Some(s"${q.name} (plan failed: ${e.getMessage.take(80)})")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // Two window guards sharing ONE sweep of the registry (building each
  // query's DataFrame eagerly runs checkpointed training/propagation
  // loops, so the sweep itself is the expensive part — collect every
  // Window node once and apply both rules to it):
  //
  //  (a) EMPTY partition spec: funnels the ENTIRE input through one
  //      task — admissible ONLY over inputs constant-bounded by
  //      construction (a limit-k list, a bucket-offset table), never
  //      anything corpus-growing (the q_collocations r5 defect: a
  //      global total over the distinct-bigram table, billions of rows
  //      at web scale). Must be allowlisted AND tiny at sf0.01.
  //  (b) scale-FIXED low-cardinality keys (o_orderstatus: 3, a fixed
  //      query set: 10): the whole input funnels into that many tasks.
  //      Every window over a non-trivial input must partition on a key
  //      whose cardinality grows with the data. Windows over tiny
  //      pre-aggregated inputs are exempt. Runs at sf0.01, where
  //      scale-growing keys are already > 10 (l_suppkey: 100) but
  //      scale-fixed keys are not.
  test("windows: no empty-partition spec over unbounded input, no low-cardinality keys") {
    val sf01 = "/root/testdata/sf0.01"
    val smallInputRows = 1000L
    val emptyAllowed = Map(
      // rank over the two bounded top-20 retrieval lists
      "q_hybrid_rrf" -> 100L,
      // cumulative offsets over the bucket-count tables (aggregate-scale)
      "q_rank_global" -> 1000L,
      "q_quality_deciles" -> 1000L,
      // tradeoff curve: same decile recipe, plus the reverse-cumulative
      // windows over the 10-row decile table
      "q_quality_tradeoff" -> 1000L,
      // corpus card: token-share total over the ~#sources-row rollup
      "q_corpus_card" -> 1000L,
      // perplexity gate: same two-phase decile recipe — the empty
      // window rides the bucket-count table (aggregate-scale)
      "q_perplexity_filter" -> 1000L)
    val offenders = SparkEntry.all.flatMap { q =>
      val windows = q.fn(spark, sf01).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      windows.flatMap { w =>
        val child = org.apache.spark.sql.GraftBridge.ofRows(spark, w.child)
        if (w.partitionSpec.isEmpty) {
          emptyAllowed.get(q.name) match {
            case None =>
              Some(s"${q.name}: empty-partition window not on the allowlist — " +
                "rewrite as agg + broadcast crossJoin (the BM25 corpus-stats " +
                "pattern) or partial aggregations joined back")
            case Some(bound) =>
              val rows = child.count()
              if (rows <= bound) None
              else Some(s"${q.name}: empty-partition window over $rows rows " +
                s"(bound $bound) — input is not constant-bounded")
          }
        } else {
          val card = child.select(
            w.partitionSpec.map(org.apache.spark.sql.GraftBridge.column): _*)
            .distinct().count()
          if (card > 10) None
          else {
            val rows = child.count()
            if (rows <= smallInputRows) None
            else Some(s"${q.name}: window over $rows rows partitioned on " +
              s"cardinality-$card key [${w.partitionSpec.mkString(", ")}]")
          }
        }
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // Load-bearing plan features of the headline bench set. String-level on
  // purpose: AQE wraps the plan in AdaptiveSparkPlanExec (a leaf — collect
  // can't see inside), but toString renders the full initial plan.
  test("headline plans keep pushdown and broadcast shapes") {
    val mustContain: Map[String, Seq[String]] = Map(
      "q_tpch_q6" -> Seq("PushedFilters: [IsNotNull"),
      "q_tpch_q3" -> Seq("PushedFilters: [IsNotNull", "BroadcastHashJoin"),
      "q_filter_predicates" -> Seq("PushedFilters: [IsNotNull"),
      // all three dims broadcast AND the exact decimal sums ride the
      // two-long Dec128Sum accumulator (r9 audit: the remaining 12x
      // vs DuckDB at sf0.1 is the per-row BigDecimal multiply + the
      // fixed job floor, not a plan defect — PLANS.md r9 note)
      "q_join_inner" -> Seq("BroadcastHashJoin", "graft_dec128_sum"),
      "q_join_broadcast" -> Seq("BroadcastHashJoin"),
      "q_ann_lsh" -> Seq("BroadcastHashJoin"),
      // the HAVING subquery must arrive as a SEMI join (never inner —
      // that would duplicate orders rows and corrupt the sums)
      "q_tpch_q18" -> Seq("LeftSemi"),
      // keep-first dedup must plan as the sort-free keeper-semi-join
      // (r9 rewrite): narrow min(orderCol) HashAggregate + hinted
      // shuffled HASH join — never the row_number window (sorts the
      // full text payload both sides of its exchange) and never a
      // sort-merge fallback (same sorts, at exactly the scale where
      // the keeper set outgrows broadcast)
      "q_corpus_curation" -> Seq("ShuffledHashJoin", "LeftSemi"),
      "q_dedup_exact" -> Seq("ShuffledHashJoin", "LeftSemi"),
      // non-equi (vec_id <> qid) against an explicitly broadcast 10-row
      // query set: nested-loop is fine ONLY because it's broadcast; and
      // the two-phase top-k must partial-aggregate before its shuffle
      "q_similarity_topk" -> Seq("BroadcastNestedLoopJoin", "ObjectHashAggregate"),
      // the bloom prefilter feeds an exact SEMI join with the dim filter
      // pushed into its scan — the sketch is an optimization, never the
      // correctness path
      "q_bloom_prefilter_join" -> Seq(
        "BroadcastHashJoin", "LeftSemi", "LessThan(s_nationkey,5)"),
      // bigram self-scoring at fixture scale must take the literal-LM
      // path: the probability map probed by the narrow whole-document
      // codegen expression (r13 — one array probe loop per doc, no
      // explode/exchange/re-agg), never a per-query join chain (the
      // distributed branch's broadcast/keyed gates are pinned by the
      // dedicated dual-path test below)
      "q_bigram_lm" -> Seq("graft_lm_array_score"),
      // the 6-way Q5: every dimension arrives broadcast, both fact
      // filters reach the parquet scans
      "q_tpch_q5" -> Seq("BroadcastHashJoin", "PushedFilters: [IsNotNull"),
      // Q10's quarter + return-flag filters must be pushed to the scans
      "q_tpch_q10" -> Seq(
        "BroadcastHashJoin", "EqualTo(l_returnflag,R)"),
      // k-means summary: the final assignment is a pure projection (see
      // the dedicated join-free test below); the only plan features left
      // to pin here are the hash aggregation + the cached corpus scan
      "q_kmeans_embed" -> Seq("HashAggregate", "InMemoryTableScan"),
      // the OOV vocabulary is a bounded top-k joined by broadcast
      "q_oov_rate" -> Seq("BroadcastHashJoin"),
      // Q21's EXISTS/NOT EXISTS self-joins must arrive as SEMI and ANTI
      // (an inner spelling would duplicate fact rows and corrupt the
      // counts), with no cartesian anywhere (blanket test above)
      "q_tpch_q21" -> Seq("LeftSemi", "LeftAnti"),
      // Q9's like-filtered part dim and the supplier/nation dims ride
      // broadcasts; only the derived-partsupp join is a real exchange
      "q_tpch_q9" -> Seq("BroadcastHashJoin"),
      // collocations: margins join back KEYED (BroadcastHashJoin at test
      // SF) and the grand total is the 1-row nested-loop broadcast — the
      // r5 empty-partition-window defect must never return
      "q_collocations" -> Seq("BroadcastHashJoin", "BroadcastNestedLoopJoin"),
      // source mixing: the per-source threshold table broadcasts back
      "q_source_mix" -> Seq("BroadcastHashJoin"),
      "q_source_mix_weighted" -> Seq("BroadcastHashJoin"),
      "q_dedup_source_overlap" -> Seq("BroadcastHashJoin"),
      // SemDeDup: the within-cell pair join must carry the int8-quantized
      // vectors with the quantized-cosine prefilter ON the join, and the
      // corpus must come from the shared training cache; the quantization
      // is the fused codegen graft_int8_quant expression (r16) — a
      // regression to raw float embeddings in the pair exchange would
      // erase both function names
      "q_semantic_dedup" -> Seq("graft_int8_quant", "graft_cosine_sim_i8", "InMemoryTableScan"),
      // the fused native counters and the two-long decimal accumulator
      // must stay in these plans — a regression to the interpreted HOF
      // spelling / BigDecimal Sum would erase the function names
      "q_repetition_signals" -> Seq("graft_repetition_stats"),
      // domainCap's mega-domain skew guard: Spark's rank-limit pushdown
      // must keep planning a map-side partial WindowGroupLimit for the
      // row_number-then-filter cap (measured 2x cheaper than a salted
      // pre-rank at 50M rows — DomainCapAB); losing it would put a
      // flooded domain back into one partition silently
      "q_domain_cap" -> Seq("WindowGroupLimit"),
      "q_agg_q1" -> Seq("graft_dec128_sum"),
      // r15: the moving sum runs in plain LONG arithmetic (quantity is
      // an integral count; the loud guard keeps foreign corpora honest).
      // The single-range-exchange shape is pinned in the dedicated test
      // below — the "rangepartitioning(l_suppkey" fragment that used to
      // live here was vacuous (the presentation orderBy's sort keys
      // also lead with l_suppkey, so it matched even after a regression
      // to a hash exchange for the window; r15 ADVICE).
      "q_window_moving" -> Seq("raise_error"),
      // IVF recall queries: the query set is a LITERAL exploded array
      // (collected with the k-means seed, one driver action for both),
      // so the scored pass is join-free — not even a broadcast build —
      // and every ranking rides ONE bounded two-phase aggregation
      // (agg FILTER clauses). Generate = the literal query explode.
      "q_ann_ivf_trained" -> Seq("ObjectHashAggregate", "Generate"),
      "q_ann_ivf_nprobe" -> Seq("ObjectHashAggregate", "Generate"),
      // boilerplate strip (r11 literal path): fused frequency scan +
      // broadcast strip probe both run eagerly into a checkpoint, so
      // the fused names are pinned on the OPERATOR frames in the
      // dedicated test below; nothing left to pin on the final plan
      // beyond the no-join guard there.
      // retrieval family (bench headline from r9; literal-stats form
      // r10): BM25's model state (N, Σdl, per-term df) bakes into the
      // scoring expression over the checkpointed fused-scan frame, so
      // the final plan is posexplode + one doc-keyed aggregation +
      // bounded top-k — the no-join half of the pin lives in the
      // literal-state test below
      "q_bm25" -> Seq("TakeOrderedAndProject"),
      // both retrieval lists are bounded top-20 BEFORE the rank/fuse
      // (TakeOrdered, never a full sort of the scored corpus)
      "q_hybrid_rrf" -> Seq("TakeOrderedAndProject"),
      // the benchmark shingle set is literal model state probed by the
      // fused codegen pass — no exploded corpus rows, no join (the
      // past-cap join path is dual-path spec'd in GraftOpsSpec)
      "q_contamination" -> Seq("graft_shingle_hits"),
      // posting lists are capped via the bounded aggregation path
      // (ObjectHashAggregate partials), never an uncapped collect_list
      "q_inverted_index" -> Seq("ObjectHashAggregate"),
      // the rule batteries must keep their fused single-pass
      // expressions — a regression to the interpreted lambda spelling
      // (measured 4-7x slower) would erase these function names.
      // (q_gopher_rules and, since r11, q_c4_clean checkpoint their
      // battery rows before the presentation sort, so their fused
      // names are pinned against the OPERATOR plan in the dedicated
      // test below.)
      "q_line_dedup" -> Seq("graft_token_lines"),
      // the PII battery is one fused pass (six builtin regex
      // evaluations per row collapsed into graft_pii_stats)
      "q_pii_scrub" -> Seq("graft_pii_stats"))
    val failures = mustContain.toSeq.sortBy(_._1).flatMap { case (name, frags) =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      frags.collect {
        case f if !plan.contains(f) => s"$name: missing plan fragment '$f'"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // q_window_moving's r15 closure shape: the prefix-difference moving
  // sum rides ONE explicit repartitionByRange on the window's partition
  // key, and the presentation orderBy stays a LOCAL sort on top of that
  // partitioning — exactly one exchange in the whole plan, and it is a
  // SINGLE-column range partitioning (the 5-key presentation sort would
  // print more keys before the partition count). A regression to a hash
  // exchange for the window, or a second exchange for the final sort,
  // flips one of these two asserts — neither can go vacuously green the
  // way the old shared-prefix fragment did (r15 ADVICE).
  test("q_window_moving: exactly one exchange, single-key range partitioning") {
    val plan = SparkEntry.queries("q_window_moving")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange".r.findAllIn(plan).size
    assert(nExchanges == 1,
      s"q_window_moving: expected exactly 1 exchange, found $nExchanges:\n$plan")
    assert("rangepartitioning\\(l_suppkey#\\d+L ASC NULLS FIRST, \\d+\\)".r
      .findFirstIn(plan).isDefined,
      s"q_window_moving: single-column range partitioning on l_suppkey missing:\n$plan")
  }

  // Keep-ONE-row-per-key operators (dedupExact keep-first, mergeLatest
  // keep-last, and every query built on them) must never plan a Window
  // node again: the r8 row_number spelling shipped the FULL row payload
  // (text included) through the exchange and sorted it per key
  // partition — at 100 TB, with a near-unique key, that is the
  // heaviest avoidable exchange in a curation/upsert pipeline. The
  // keeper-aggregation + semi-join spelling sorts only narrow columns.
  test("keep-first dedup and latest-wins upsert plans contain no Window node") {
    Seq("q_dedup_exact", "q_dedup_fingerprint", "q_corpus_curation",
      "q_upsert_latest").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name: Window node back in a keep-one-per-key plan:\n$plan")
    }
  }

  // The URL blocklist gate is a pure per-row decision: the literal
  // blocklist must ride inside the projection (exists over a literal
  // array), never become a join side or a window — either would turn a
  // free-scaling scan gate into an exchange.
  test("q_url_blocklist plans no Join and no Window") {
    val plan = SparkEntry.queries("q_url_blocklist")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"Join in blocklist-gate plan:\n$plan")
    assert(!plan.contains("Window"), s"Window in blocklist-gate plan:\n$plan")
  }

  // The repeated-span detector's count + distinct-doc-count pair must
  // plan as the two-phase aggregation chain, never an Expand: Expand
  // doubles every exploded span row before the exchange — at corpus
  // scale that is 2x the already-largest shuffle in the query.
  test("q_repeated_spans plans no Expand") {
    val plan = SparkEntry.queries("q_repeated_spans")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"Expand in repeated-spans plan:\n$plan")
  }

  // The narrow pipeline operators must STAY narrow: per-row quality
  // signals, hash sampling, and token-window chunking may not introduce
  // a hash shuffle (their only exchange is the final presentation
  // sort's range partitioning; chunking is scan → posexplode → sort).
  // A regression here — say a rewrite that sneaks in an explode+groupBy —
  // would turn a free-scaling map into a corpus-wide shuffle.
  test("repetition signals and hash sampling plan no hash shuffle") {
    // q_dsir_weights qualifies because its histogram pass runs eagerly
    // at construction (collected model state); the RETURNED scoring
    // plan projects the fused weight expression over the literal
    // ratio table. q_gopher_rules / q_c4_clean: single-fused-pass rule
    // batteries. The classifier / dsir / rule queries DO carry one
    // rangepartitioning exchange — the doc_id range their presentation
    // sort rides (input exchanged before compute so the sort samples
    // only the scan); what this guard bans is a HASH shuffle, i.e. any
    // grouping/join sneaking into a per-row pipeline.
    Seq("q_repetition_signals", "q_stratified_sample", "q_chunk_windows",
      "q_quality_classifier", "q_dsir_weights", "q_gopher_rules",
      "q_c4_clean").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"),
        s"$name: unexpected hash exchange in\n$plan")
    }
  }

  // Line dedup's corpus-global exchange must carry the 16-byte md5
  // digest, never line text (the q_repeated_spans lesson): the window
  // partitions on unhex(md5(line)), and column pruning must drop the
  // line string BEFORE the exchange — its post-shuffle output is
  // exactly (doc_id: long, digest: binary). AQE is disabled for the
  // node walk (AdaptiveSparkPlanExec hides the exchange nodes).
  test("q_line_dedup shuffles 16-byte digests, not line strings") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_line_dedup")(spark, sfDir)
        .queryExecution.executedPlan
      val hashEx = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
      }
      assert(hashEx.nonEmpty, s"no hash exchange found:\n$plan")
      hashEx.foreach { e =>
        assert(!e.output.exists(_.name == "line"),
          s"line text crosses the exchange: ${e.output.map(_.name)}\n$plan")
      }
      // the window exchange (the corpus-scale one; the other is the
      // doc_id partial-agg) must key on the binary digest
      assert(hashEx.exists(_.output.exists(
        _.dataType == org.apache.spark.sql.types.BinaryType)),
        s"digest key missing from every exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // k-means assignment must be NARROW — with the literal-centroid
  // NearestCentroid expression there is no join of ANY kind in the
  // whole query: the corpus-scale embedding payload reaches its argmin
  // in a projection, and the only exchanges are the tiny post-assignment
  // aggregations. The same holds for the IVF recall queries: their
  // query set is a literal exploded array, so the scored pass has no
  // join either. A regression reintroducing a join (e.g. a centroid
  // table crossJoin, or a broadcast query-set join) would re-add
  // broadcast-build jobs to every training-loop query.
  test("gopher battery keeps its fused single-pass expression (operator plan)") {
    // q_gopher_rules checkpoints the battery rows before its
    // presentation sort, so the registered query's FINAL plan no longer
    // shows the fused name — pin it on the operator frame instead (the
    // regression class is the battery collapsing back to the
    // interpreted lambda spelling, measured 4-7x slower)
    val plan = GraftOps.gopherRules(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_gopher_stats"), plan)
  }

  test("c4 + boilerplate keep their fused expressions (operator plans)") {
    // both registered queries checkpoint before their presentation
    // sorts (r11), so the fused names are invisible on the final plans
    // — pin them on the operator frames (same regression class as the
    // gopher battery: a collapse back to interpreted lambda / join
    // spellings)
    val docs = Tables.documents(spark, sfDir)
    // the REGISTERED construction: battery over the derived-line frame,
    // so BOTH fused names (suffix_lines derivation + c4 battery) stay
    // pinned — the plain c4Clean(docs) spelling would let suffix_lines
    // regress to its interpreted lambda chain unnoticed
    val c4 = graft.ops.FilterOps.c4Clean(
      graft.ops.FilterOps.derivedLines(docs), "ltext")
      .queryExecution.executedPlan.toString
    assert(c4.contains("graft_c4_stats") && c4.contains("graft_suffix_lines"), c4)
    val withWords = docs.filter(
      graft.ops.TextOps.wordCount(col("text")) >= 1)
    val bc = spark.sparkContext.broadcast(
      new graft.functions.StrSet(new java.util.HashSet[String]()))
    val probe = graft.ops.FilterOps.boilerProbeFrame(withWords, bc, 4)
      .queryExecution.executedPlan.toString
    assert(probe.contains("graft_boiler_strip"), probe)
    // and the frequency side must stay the per-doc-distinct fused scan
    // (count, never the expand + distinct countDistinct spelling) —
    // pinned end-to-end: the registered query's construction is the
    // only caller, so assert on a hand-built equivalent
    val freq = withWords.select(explode(org.apache.spark.sql.GraftBridge.column(
        graft.functions.LineDigests(
          org.apache.spark.sql.GraftBridge.expression(col("text")), 4))).as("dg"))
      .groupBy("dg").agg(count(lit(1)).as("nd"))
      .queryExecution.executedPlan.toString
    assert(freq.contains("graft_line_digests") && !freq.contains("Expand"), freq)
    // first-occurrence line dedup: same regression class — the literal
    // path's strip must stay the fused WinnerMap probe, and the winner
    // pass must stay the per-position fused digest scan
    val wm = spark.sparkContext.broadcast(
      new graft.functions.WinnerMap(new java.util.HashMap[String, Array[Long]]()))
    val strip = graft.ops.FilterOps.firstStripFrame(withWords, wm, 4)
      .queryExecution.executedPlan.toString
    assert(strip.contains("graft_first_line_strip"), strip)
    val winners = withWords.select(col("doc_id"),
        posexplode(org.apache.spark.sql.GraftBridge.column(
          graft.functions.LineDigestSeq(
            org.apache.spark.sql.GraftBridge.expression(col("text")), 4))))
      .toDF("doc_id", "pos", "dg")
      .groupBy("dg")
      .agg(min(struct(col("doc_id"), col("pos").cast("long").as("pos"))).as("w"),
        count(lit(1)).as("cnt"))
      .queryExecution.executedPlan.toString
    assert(winners.contains("graft_line_digest_seq") &&
      !winners.contains("Expand"), winners)
  }

  // exact-substring dedup: both passes must stay fused — the count
  // pass explodes 8-byte rolling digests from ONE scan expression
  // (never window strings, never an Expand), and the literal-path
  // strip is a single narrow projection against the broadcast set
  // (a Join/Exchange appearing means the fast path regressed to the
  // join spelling)
  test("substring dedup: fused digest scan and fused strip stay narrow") {
    val docs = Tables.documents(spark, sfDir)
    val k = 8
    val cnt = docs
      .filter(graft.ops.TextOps.wordCount(col("text")) >= k)
      .select(explode(
        graft.functions.GraftFunctions.shingle_digest_seq(col("text"), k)).as("dg"))
      .groupBy("dg").agg(count(lit(1)).as("cnt"))
      .queryExecution.executedPlan.toString
    assert(cnt.contains("graft_shingle_digest_seq") && !cnt.contains("Expand"), cnt)
    val bc = spark.sparkContext.broadcast(
      new graft.functions.LongSet(Array.emptyLongArray))
    val strip = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.substring_strip(col("text"), bc, k).as("st"))
      .queryExecution.executedPlan.toString
    assert(strip.contains("graft_substring_strip") && !strip.contains("Join") &&
      !strip.contains("Exchange"), strip)
  }

  test("training queries plan no join at all (literal centroid + query state)") {
    // q_bm25 joined its way from stats to scores until r10: now N, Σdl
    // and the per-term doc frequencies are literal model state, so a
    // join reappearing means the literal-stats path regressed
    Seq("q_kmeans_embed", "q_ann_ivf_trained", "q_ann_ivf_nprobe",
        "q_bm25").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"unexpected join in $name plan:\n$plan")
    }
  }

  // Fixture invariants the query suite's rewrites RELY on — enforced
  // here so a generator change fails loudly instead of silently
  // diverging Spark vs oracle:
  //  - o_orderkey unique in orders: Q21 joins orders via left_semi where
  //    its oracle spells an inner join — equivalent ONLY under
  //    uniqueness (a duplicate key would duplicate fact rows on the
  //    oracle side but not the semi side).
  test("fixture invariants: o_orderkey is unique in orders") {
    // checked at EVERY generated SF — the rewrite must hold wherever the
    // suite (verify gate, bench, scale runs) actually executes
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val orders = Tables.orders(spark, s"/root/testdata/$sf")
      assert(orders.count() == orders.select("o_orderkey").distinct().count(),
        s"o_orderkey is not unique in orders at $sf — Q21's semi/inner equivalence breaks")
    }
  }

  // The bigram LM is TRIPLE-GATED by measured type count: literal map
  // under the literal cap, broadcast-hinted probability-table join
  // between the caps, planner-chosen keyed join past broadcast range (a
  // forced hint never degrades; past broadcast range the job must fall
  // back, not die). Pin all three: the literal default is covered by
  // the headline-plans test; here the literal-off path must broadcast,
  // the fully-gated-off path must plan WITHOUT the hint, and all three
  // must produce identical rows.
  test("q_bigram_lm: literal, broadcast, and gated-off paths agree") {
    val sf01 = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, sf01)
    val literal = ops.PipelineOps.bigramLogProb(docs)
    val hinted = ops.PipelineOps.bigramLogProb(docs, maxLiteralTypes = 0L)
    assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "literal-off path must broadcast the probability table")
    val unhinted = ops.PipelineOps.bigramLogProb(docs,
      maxBroadcastTypes = 0L, maxLiteralTypes = 0L)
    // force a genuine non-broadcast plan: disable the size estimator's
    // auto-broadcast so the only way to a BHJ would be the (withheld) hint
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = ops.PipelineOps.bigramLogProb(docs,
          maxBroadcastTypes = 0L, maxLiteralTypes = 0L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"gated-off path still broadcasts:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val a = literal.orderBy("doc_id").collect().toSeq
    val b = hinted.orderBy("doc_id").collect().toSeq
    val c = unhinted.orderBy("doc_id").collect().toSeq
    assert(a == b, "literal and broadcast bigram-LM paths disagree")
    assert(b == c, "hinted and unhinted bigram-LM paths disagree")
    // r13: the observe-riding type counter OVERFLOWS mid-aggregation at
    // a tiny cap (the poisoned map buffer → null metric) and the
    // operator must fall back to the distributed path with identical
    // rows — this is the runtime overflow signal, distinct from the
    // cap=0 gate above
    val overflowed = ops.PipelineOps.bigramLogProb(docs, maxLiteralTypes = 3L)
    assert(overflowed.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "overflow fallback must take the distributed (broadcast-table) path")
    assert(overflowed.orderBy("doc_id").collect().toSeq == a,
      "overflow-fallback rows disagree with the literal path")
  }

  // The supplier-scale dims in Q5/Q7/Q8/Q9/Q15/Q21 (and Q2's euroSupp)
  // carry NO forced broadcast hint (dimBroadcast policy: a hint never
  // degrades, and supplier/customer scale linearly with the fact data).
  // The broadcast must still HAPPEN at test SF — picked by the planner
  // from size estimates / AQE — or the fact side would start shuffling
  // on every dim join. Execute and inspect the FINAL adaptive plan.
  test("unhinted supplier dims still arrive broadcast at sf0.01 (planner's choice)") {
    val sf01 = "/root/testdata/sf0.01"
    Seq("q_tpch_q21", "q_tpch_q9", "q_tpch_q8").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf01)
      // collect() executes THIS DataFrame's queryExecution (count()
      // would plan a separate one and leave df's adaptive plan
      // un-finalized), so the string below is AQE's final join choice
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"),
        s"$name: adaptive plan not finalized\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: no broadcast join in final plan\n$plan")
    }
  }

  // Column pruning must reach the scan: Q6 projects 4 lineitem columns,
  // so the parquet ReadSchema must carry exactly those 4 — a scan reading
  // all 16 for a 4-column aggregate is wrong at any scale.
  test("q_tpch_q6 scan reads only the 4 referenced columns") {
    val plan = SparkEntry.queries("q_tpch_q6")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.nonEmpty, s"no scan in plan:\n$plan")
    val cols = schemas.head.split(",").map(_.takeWhile(_ != ':').trim).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"unexpected read schema: $cols")
  }

  // The bench's measured action must MATERIALIZE every output column.
  // count() does not: Catalyst prunes columns the count never reads —
  // dropping unreferenced per-row projections and cardinality-preserving
  // joins (q_semantic_dedup's count() plan contained none of its four
  // joins). Pin both directions with a raise_error canary column: the
  // old count() action never evaluates it, the noop-sink write does.
  test("bench noop-write action evaluates pruned-under-count projections") {
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    // a Range source, NOT a local Seq: ConvertToLocalRelation evaluates
    // projections over LocalRelation at optimization time, which would
    // fire the canary under count() too and prove nothing
    val df = spark.range(1, 3).toDF("x")
      .select(col("x"),
        when(col("x") > 0, raise_error(lit("canary evaluated"))).as("boom"))
    assert(df.count() == 2) // count() prunes `boom`: no error raised
    val e = intercept[Exception] {
      df.write.format("noop").mode("overwrite").save()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("canary evaluated")),
      s"noop write did not evaluate the canary column: $e")
  }
}
