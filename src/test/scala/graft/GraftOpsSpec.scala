package graft

import org.apache.spark.sql.functions._

/** Facade behavior tests. The oracle gate already covers the facade's
  * main paths (the registered queries are built ON it); what's left for
  * specs is the parameter surface the fixtures never exercise —
  * excludeSelf=false, the stopword gate toggle, collision safety,
  * empty-input edges.
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

  test("dedupExact orderUnique probes on the order column alone, same rows") {
    import spark.implicits._
    // ord values GLOBALLY unique — the precondition orderUnique asserts
    // (a doc_id-style row id); under it the keeper-id semi join must
    // return exactly the pair-join rows, in the caller's schema order
    val df = Seq(
      ("a", 3L, "x3"), ("a", 1L, "x1"), ("b", 2L, "y2"), ("a", 5L, "x5"))
      .toDF("k", "ord", "payload")
    val viaPair = GraftOps.dedupExact(df, "k", "ord")
      .orderBy("ord").collect().toSeq
    val viaOrd = GraftOps.dedupExact(df, "k", "ord", orderUnique = true)
      .orderBy("ord").collect().toSeq
    assert(viaPair == viaOrd)
    assert(viaPair.map(_.schema.fieldNames.toSeq).distinct ==
      Seq(Seq("k", "ord", "payload")), "schema order must be preserved")
  }

  test("valueDeciles rejects carry columns that shadow recipe internals") {
    import spark.implicits._
    val df = Seq((1L, 10L, 2L)).toDF("id", "m", "n_total")
    val e = intercept[IllegalArgumentException] {
      GraftOps.valueDeciles(df, "m", "id", 50, carryCols = Seq("n_total"))
    }
    assert(e.getMessage.contains("n_total") && e.getMessage.contains("reserved"))
    // the metric/id columns are reserved too (selecting them twice would
    // be an ambiguous reference downstream)
    intercept[IllegalArgumentException] {
      GraftOps.valueDeciles(df, "m", "id", 50, carryCols = Seq("m"))
    }
  }

  test("fingerprint: tokenizer spelling == regex spelling on adversarial texts") {
    import spark.implicits._
    // the r9 regex-free fingerprint must hash identically to the
    // lower+regexp_replace spelling the DuckDB oracle still uses —
    // across mixed case, every whitespace the tokenizer knows, empty
    // and all-whitespace strings, and punctuation runs
    val ws = Seq(" ", "\t", "\n", " ", " ", "　", "\r\n")
    val rnd = new scala.util.Random(7)
    def word() = (0 until 1 + rnd.nextInt(8)).map { _ =>
      val c = "aZbY9cX.!dW,eV".charAt(rnd.nextInt(14)); c
    }.mkString
    val texts = Seq("", " ", "　\t ", "ONE two THREE", "  padded  ") ++
      (0 until 200).map { _ =>
        (0 until rnd.nextInt(12)).map(_ => word()).mkString(ws(rnd.nextInt(ws.size))) +
          (if (rnd.nextBoolean()) ws(rnd.nextInt(ws.size)) else "")
      }
    val regexSpelling =
      md5(trim(regexp_replace(lower(col("text")), ops.TextOps.WsRe, " ")))
    val rows = texts.toDF("text")
      .select(GraftOps.fingerprint(col("text")).as("fused"),
        regexSpelling.as("regex"), col("text"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"fingerprint mismatch on ${r.getString(2).take(60).toSeq}")
    }
  }

  test("cosineTopK excludeSelf=false scores a corpus row sharing a query id") {
    import spark.implicits._
    // corpus id 7 == query id 7 but DIFFERENT vectors (independent id
    // spaces): with excludeSelf=false the corpus row must be scored
    val corpus = Seq(
      (7L, Array(1f, 0f)), (8L, Array(0.9f, 0.1f)), (9L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((7L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val withSelf = GraftOps.cosineTopK(corpus, queries, 1, excludeSelf = false)
      .collect()
    assert(withSelf.length == 1 && withSelf.head.getAs[Long]("vid") == 7L)
    val without = GraftOps.cosineTopK(corpus, queries, 1)
      .collect()
    assert(without.length == 1 && without.head.getAs[Long]("vid") == 8L)
  }

  test("curate applies both gates, and the stopword gate can be disabled") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (2L, "too short", "en"),
      (3L, "foo bar baz qux quux corge grault garply waldo fred", "xx"))
      .toDF("doc_id", "text", "lang")
    val gated = GraftOps.curate(docs, minTokens = 10)
    assert(gated.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // doc 3 has >= 10 tokens but zero stopword signal
    val noStopGate = GraftOps.curate(docs, minTokens = 10,
      requireStopwordSignal = false)
    assert(noStopGate.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val out = gated.columns.toSet
    assert(out == Set("doc_id", "text", "lang", "n_tokens"))
    assert(gated.collect().head.getAs[Long]("n_tokens") == 12L)
  }

  test("curate dedups whitespace-variant texts keeping the smallest id") {
    import spark.implicits._
    val docs = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (4L, "the  quick   brown fox jumps over the lazy dog again and again", "en"))
      .toDF("doc_id", "text", "lang")
    val kept = GraftOps.curate(docs, minTokens = 10).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("curate never clobbers caller passthrough columns") {
    import spark.implicits._
    // caller columns named like plausible internals must survive
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again",
        "caller-data"))
      .toDF("doc_id", "text", "rn")
    val out = GraftOps.curate(docs, minTokens = 10)
    assert(out.columns.toSet == Set("doc_id", "text", "rn", "n_tokens"))
    assert(out.collect().head.getAs[String]("rn") == "caller-data")
  }

  test("repetitionSignals computes the three signals on a crafted doc") {
    import spark.implicits._
    // "a a b": n=3, top word "a" 2/3; bigrams ["a a","a b"] all distinct
    // -> dup 0.0; mean word len 1.0. One-word docs are dropped.
    val docs = Seq((1L, "a a b"), (2L, "solo")).toDF("doc_id", "text")
    val rows = GraftOps.repetitionSignals(docs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(math.abs(r.getAs[Double]("top_unigram_frac") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r.getAs[Double]("mean_word_len") == 1.0)
    // fully repeated doc: "x x x" -> bigrams ["x x","x x"] -> dup 0.5
    val rep = GraftOps.repetitionSignals(
      Seq((3L, "x x x")).toDF("doc_id", "text")).collect().head
    assert(rep.getAs[Double]("dup_bigram_frac") == 0.5)
    assert(rep.getAs[Double]("top_unigram_frac") == 1.0)
  }

  test("packSequences spans sequence boundaries and isolates shards") {
    import spark.implicits._
    // shard A: 300 + 300 tokens under budget 512 -> doc 11 fits in seq 0,
    // doc 12 spans seqs 0..1. Shard B restarts at seq 0.
    val docs = Seq(
      (11L, "A", ("w " * 300).trim),
      (12L, "A", ("w " * 300).trim),
      (21L, "B", ("w " * 10).trim))
      .toDF("doc_id", "source", "text")
    val out = GraftOps.packSequences(docs)
      .select("doc_id", "start_seq", "end_seq", "n_seqs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq((11L, 0L, 0L, 1L), (12L, 0L, 1L, 2L), (21L, 0L, 0L, 1L)))
  }

  test("invertedIndex caps posting lists but keeps full df/tf") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, "tok")).toDF("doc_id", "text")
    val r = GraftOps.invertedIndex(docs, cap = 5).collect().head
    assert(r.getAs[Long]("df") == 30L)
    assert(r.getAs[Long]("tf") == 30L)
    assert(r.getAs[String]("posting") == "1,2,3,4,5")
  }

  test("hashSample is deterministic and respects per-stratum thresholds") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val thr = Map("a" -> GraftOps.sampleThreshold(0.5))
    val kept = GraftOps.hashSample(df, "id", "stratum", thr,
      GraftOps.sampleThreshold(0.0))
    val counts = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate-0 stratum keeps nothing; rate-0.5 stratum keeps about half
    assert(!counts.contains("b"))
    assert(counts("a") > 350 && counts("a") < 650)
    // deterministic: the same call yields the same rows
    val again = GraftOps.hashSample(df, "id", "stratum", thr,
      GraftOps.sampleThreshold(0.0))
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // threshold encoding: fixed-width hex of rate * 2^32; rate 1.0 is a
    // sentinel above all hex so keep-everything keeps "ffffffff" rows too
    assert(GraftOps.sampleThreshold(0.125) == "20000000")
    assert(GraftOps.sampleThreshold(0.5) == "80000000")
    assert(GraftOps.sampleThreshold(0.0) == "00000000")
    assert(GraftOps.sampleThreshold(1.0) == "g")
    val everything = GraftOps.hashSample(df, "id", "stratum",
      Map.empty, GraftOps.sampleThreshold(1.0))
    assert(everything.count() == df.count())
    // hashCol parameter: the audit column lands under the caller's name
    assert(GraftOps.hashSample(df, "id", "stratum", thr,
      GraftOps.sampleThreshold(0.0), hashCol = "__sample_h")
      .columns.contains("__sample_h"))
  }

  test("bloomSemiJoin equals the exact semi join") {
    import spark.implicits._
    val fact = (0L until 500L).map(k => (k % 50, k)).toDF("k", "payload")
    val dim = Seq(3L, 7L, 11L).toDF("dk")
    val viaBloom = GraftOps.bloomSemiJoin(fact, "k", dim, "dk")
      .collect().map(_.getLong(1)).sorted.toSeq
    val exact = fact.join(dim, col("k") === col("dk"), "left_semi")
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(viaBloom == exact)
  }

  test("contamination counts distinct-shingle overlap against the benchmark") {
    import spark.implicits._
    val bench = Seq((1L, "a b c d")).toDF("doc_id", "text")
    // corpus doc shingles: {"a b c","b c x","c x y"}; bench: {"a b c","b c d"}
    val corpus = Seq((10L, "a b c x y"), (11L, "p q r s")).toDF("doc_id", "text")
    val rows = GraftOps.contamination(corpus, bench)
      .orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_shingles") == 3L)
    assert(rows(0).getAs[Long]("n_hit") == 1L)
    assert(math.abs(rows(0).getAs[Double]("frac") - 1.0 / 3) < 1e-12)
    assert(rows(1).getAs[Long]("n_hit") == 0L)
    assert(rows(1).getAs[Double]("frac") == 0.0)
  }

  test("contamination literal-set and join paths agree on the fixture corpus") {
    // the engine self-selects by measured benchmark-shingle count; the
    // fused codegen probe must state the join spelling's exact results
    val docs = Tables.documents(spark, sfDir)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val lit_ = key(ops.PipelineOps.contaminationCheck(docs, bench))
    val join = key(ops.PipelineOps.contaminationCheck(docs, bench,
      maxLiteralShingles = 0))
    assert(lit_ == join)
    assert(lit_.nonEmpty && lit_.exists(_._3 > 0))
  }

  test("mergeLatest keeps the greatest version per key across base and delta") {
    import spark.implicits._
    val base = Seq((1L, 10L, "old"), (2L, 10L, "only-base")).toDF("k", "v", "payload")
    val delta = Seq((1L, 20L, "new"), (3L, 5L, "only-delta")).toDF("k", "v", "payload")
    val merged = GraftOps.mergeLatest(base, delta, "k", Seq("v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(merged == Seq((1L, "new"), (2L, "only-base"), (3L, "only-delta")))
  }

  test("mergeLatest sort-free rowIdCol path matches the window path") {
    import spark.implicits._
    // rid globally unique and the FINAL tiebreaker in orderCols — the
    // precombine-key contract; under it the sort-free semi-join
    // spelling must return exactly the window rows, schema order kept
    val base = Seq(
      (1L, 10L, 100L, "old"), (1L, 10L, 101L, "tie-winner"),
      (2L, 10L, 102L, "only-base")).toDF("k", "v", "rid", "payload")
    val delta = Seq(
      (1L, 20L, 103L, "new"), (3L, 5L, 104L, "only-delta"))
      .toDF("k", "v", "rid", "payload")
    val viaWindow = GraftOps.mergeLatest(base, delta, "k", Seq("v", "rid"))
      .orderBy("k").collect().toSeq
    val sortFree = GraftOps.mergeLatest(base, delta, "k", Seq("v", "rid"),
      rowIdCol = Some("rid")).orderBy("k").collect().toSeq
    assert(viaWindow == sortFree)
    assert(sortFree.map(_.getString(3)) == Seq("new", "only-base", "only-delta"))
    // the contract check: a rowIdCol outside orderCols must fail loudly
    val e = intercept[IllegalArgumentException] {
      GraftOps.mergeLatest(base, delta, "k", Seq("v"), rowIdCol = Some("rid"))
    }
    assert(e.getMessage.contains("orderCols"))
  }

  test("sourceMixTemperature: weights sum to 1, flatten toward uniform, reject bad alpha") {
    import spark.implicits._
    // big source 10x the small one: natural share 10/11 vs sqrt-flattened
    // sqrt(10)/(sqrt(10)+1) ~ 0.76 — the flattening the schedule exists for
    val docs = Seq.tabulate(22) { i =>
      val src = if (i < 20) "big" else "small"
      (i.toLong, ("w " * 10).trim, src) // 10 tokens per doc
    }.toDF("doc_id", "text", "source")
    val out = GraftOps.sourceMixTemperature(docs, alpha = 0.5, totalBudget = 100L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-9, s"weights must normalize: $out")
    val bigShare = 200.0 / 220.0
    assert(out("big") < bigShare && out("big") > 0.5,
      s"alpha=0.5 must flatten the big source below its natural share: $out")
    intercept[IllegalArgumentException] {
      GraftOps.sourceMixTemperature(docs, alpha = 0.0, totalBudget = 100L)
    }
    intercept[IllegalArgumentException] {
      GraftOps.sourceMixTemperature(docs, alpha = 0.5, totalBudget = 0L)
    }
  }

  test("text operators tolerate null and empty text rows") {
    import spark.implicits._
    // a real corpus has malformed rows; every text operator must drop or
    // pass them through without throwing — never poison the job
    val docs = Seq(
      (1L, "the quick brown fox jumps clean over the lazy dog today"),
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "   ")).toDF("doc_id", "text")
    assert(GraftOps.repetitionSignals(docs).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(GraftOps.bigramLogProb(docs).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(GraftOps.contamination(docs, docs.filter($"doc_id" === 1L))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    val packed = GraftOps.packSequences(docs.withColumn("source", lit("s")))
    assert(packed.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(GraftOps.invertedIndex(docs).agg(sum($"tf")).collect()
      .head.getLong(0) == 11L)
    // null-id rows hash to null and are excluded deterministically
    val sampled = GraftOps.hashSample(
      Seq((java.lang.Long.valueOf(5L), "a"), (null.asInstanceOf[java.lang.Long], "a"))
        .toDF("id", "stratum"),
      "id", "stratum", Map.empty, GraftOps.sampleThreshold(1.0))
    assert(sampled.collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("bigramLogProb scores a single-doc corpus at zero") {
    import spark.implicits._
    // corpus = one doc "a a a": the only bigram (a,a) has MLE prob 1 ->
    // ln 1 = 0, so the average log-prob is exactly 0 over 2 bigrams
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    val r = GraftOps.bigramLogProb(docs).collect().head
    assert(r.getAs[Long]("n_bigrams") == 2L)
    assert(r.getAs[Double]("avg_logprob") == 0.0)
  }

  test("dedupNear drops exactly the non-keeper cluster members") {
    import spark.implicits._
    // three near-identical docs (same 3-gram shingles -> same LSH
    // buckets) + one distinct doc: keeper = min doc_id of the cluster
    val dup = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (10L, dup), (11L, dup), (12L, dup),
      (20L, "one two three four five six"))
      .toDF("doc_id", "text")
    val kept = GraftOps.dedupNear(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(10L, 20L))
    val comp = GraftOps.nearDupComponents(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(11L) == 10L && comp(12L) == 10L)
  }

  test("oovRate is 0 for all-vocab docs and 1 for all-OOV docs") {
    import spark.implicits._
    // "a" dominates the corpus; vocabSize=1 makes everything else OOV
    val docs = Seq(
      (1L, "a a a"), (2L, "b c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val rates = GraftOps.oovRate(docs, vocabSize = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rates(1L) == 0.0 && rates(2L) == 1.0 && rates(3L) == 0.5)
  }

  test("valueDeciles partitions the corpus into balanced global deciles") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i * 7 % 997)).toDF("id", "m")
    val deciles = GraftOps.valueDeciles(df, "m", "id", bucketWidth = 50)
    val counts = deciles.groupBy("decile").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (1L to 10L).toSet)
    assert(counts.values.forall(c => c >= 99 && c <= 101))
    assert(counts.values.sum == 1000L)
    // decile boundaries respect the metric order: max(m) in decile d
    // <= min(m) in decile d+1
    val byDec = deciles.groupBy("decile")
      .agg(min("m").as("mn"), max("m").as("mx"))
      .orderBy("decile").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    byDec.sliding(2).foreach {
      case Array((_, mx1), (mn2, _)) => assert(mx1 <= mn2)
      case _ =>
    }
  }

  test("valueDeciles drops null-metric rows identically on both paths") {
    import spark.implicits._
    // r10 regression: the literal path unboxed a null bucket key to 0,
    // corrupting real bucket 0's cumulative offset AND emitting
    // null-decile rows the distributed path (inner offsets join) never
    // produced. Both paths must now drop null metrics up front.
    val df = ((1L to 200L).map(i => (i, Some(i * 13 % 50))) ++
      Seq((201L, Option.empty[Long]), (202L, Option.empty[Long])))
      .toDF("id", "m")
    val lit = GraftOps.valueDeciles(df, "m", "id", bucketWidth = 1)
    val dist = GraftOps.valueDeciles(df, "m", "id", bucketWidth = 1,
      maxLiteralBuckets = 0L)
    assert(lit.count() == 200L && dist.count() == 200L)
    assert(lit.filter(col("decile").isNull).isEmpty)
    assert(lit.exceptAll(dist).isEmpty && dist.exceptAll(lit).isEmpty)
  }

  test("valueDeciles literal and distributed offset paths are identical") {
    import spark.implicits._
    // width 1 on a 0..499 metric → 500 buckets: enough to exercise the
    // cumulative offsets; cap 0 forces the broadcast-offsets join path
    val df = (1L to 2000L).map(i => (i, i * 13 % 500, i % 7)).toDF("id", "m", "c")
    val lit = GraftOps.valueDeciles(df, "m", "id", bucketWidth = 1,
      carryCols = Seq("c"))
    val dist = GraftOps.valueDeciles(df, "m", "id", bucketWidth = 1,
      carryCols = Seq("c"), maxLiteralBuckets = 0L)
    assert(lit.columns.sameElements(dist.columns))
    assert(lit.exceptAll(dist).isEmpty && dist.exceptAll(lit).isEmpty)
  }

  test("bm25Scores: duplicated query terms score once (set semantics)") {
    import spark.implicits._
    // r10 regression: one token_set_counts slot was allocated per
    // queryTerms ENTRY, so a duplicated term posexploded into two slots
    // and contributed its term score twice. BM25 queries are term SETS.
    val docs = Seq(
      (1L, "spark join data spark"),
      (2L, "query stream stream other words here")).toDF("doc_id", "text")
    val once = ops.PipelineOps.bm25Scores(docs, Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val duped = ops.PipelineOps.bm25Scores(docs, Seq("spark", "query", "spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(once == duped, s"$once vs $duped")
  }

  test("sourceMix keeps small sources whole and downsamples big ones") {
    import spark.implicits._
    // source "big": 40 docs x 5 tokens = 200 tokens; "small": 2 docs
    val docs = ((1L to 40L).map(i => (i, "a b c d e", "big")) ++
      Seq((100L, "x y z", "small"), (101L, "p q", "small")))
      .toDF("doc_id", "text", "source")
    val out = GraftOps.sourceMix(docs, targetTokens = 50)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))).toMap
    val (nb, tb, rb, kb, ktb) = out("big")
    assert(nb == 40L && tb == 200L && rb == 0.25)
    // hash sampling at rate 0.25 keeps SOME strict subset; every kept
    // doc contributes 5 tokens
    assert(kb > 0L && kb < 40L && ktb == kb * 5)
    val (ns, ts2, rs, ks, kts) = out("small")
    assert(ns == 2L && ts2 == 5L && rs == 1.0 && ks == 2L && kts == 5L)
  }

  test("repeatedSpans finds cross-doc spans and ignores within-doc repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four extra"),
      (2L, "zz one two three four"),
      // doc 3 repeats a span INTERNALLY but shares it with no other doc
      (3L, "solo span here solo span here solo span here"),
      (4L, "short"))
      .toDF("doc_id", "text")
    val out = GraftOps.repeatedSpans(docs, n = 4, minDocs = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("one two three four", 2L, 2L)))
  }

  test("nearDupComponents covers singleton docs as their own component") {
    import spark.implicits._
    // two near-dups + two isolated docs: the isolated docs have no LSH
    // candidate edge, but the public facade must still return them (as
    // their own keeper) — a caller joining components back to the
    // corpus must never lose rows
    val dup = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (10L, dup), (11L, dup),
      (20L, "one two three four five six"),
      (30L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val comp = GraftOps.nearDupComponents(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.keySet == Set(10L, 11L, 20L, 30L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(20L) == 20L && comp(30L) == 30L)
  }

  test("bpeMerges learns the expected merges on a toy corpus") {
    import spark.implicits._
    // words: "aa" x2, "ab" x1 -> round 1 merges ('a','a') with weight 2,
    // leaving symbols {"aa", "a b"} -> round 2 merges ('a','b') weight 1
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = GraftOps.bpeMerges(docs, rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(merges == Seq((1, "a a", 2L), (2, "a b", 1L)))
  }

  test("bpeMerges pins the boundary-padded run-merging sequence") {
    import spark.implicits._
    // Pin the documented divergence (PipelineOps.bpeMerges scaladoc):
    // within a run of >= 4 identical symbols the non-overlapping padded
    // replace merges (1,2) and resumes after the shared boundary space,
    // so "a a a a" -> "aa a a" in round 1 (NOT "aa aa" as a
    // pairwise-rescan trainer would produce), round 2 -> "aa aa",
    // round 3 -> "aaaa", round 4 finds nothing. Both engines agree, so
    // the oracle can't catch drift here — this spec can. Round-1 cnt is
    // 3: the pair count is per OCCURRENCE ("a a a a" holds three
    // adjacent pairs), weighted by word frequency 1.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val merges = GraftOps.bpeMerges(docs, rounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(merges == Seq((1, "a a", 3L), (2, "a a", 1L), (3, "aa aa", 1L)))
  }

  test("bpeMerges rejects rounds < 1 and stops cleanly on unsplittable corpora") {
    import spark.implicits._
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](GraftOps.bpeMerges(docs, 0))
    // every word is a single symbol: no pair exists, so the result is a
    // well-formed EMPTY (round, pair, cnt) frame, not a null/emptied-
    // vocabulary artifact
    val out = GraftOps.bpeMerges(docs, rounds = 3)
    assert(out.columns.toSeq == Seq("round", "pair", "cnt"))
    assert(out.isEmpty)
  }

  test("bpeEncode applies trained merges per occurrence; zero merges = char count") {
    import spark.implicits._
    // "aaaa" trains merges (a a), (a a), (aa aa) -> every "aaaa" becomes
    // ONE symbol; "ab" only benefits from no merge and stays 2 symbols
    val docs = Seq((1L, "aaaa aaaa ab")).toDF("doc_id", "text")
    val r = GraftOps.bpeEncode(docs, rounds = 3).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 10L, 4L)))
    assert(r.getDouble(4) == 2.5) // 10 chars / 4 tokens
    // unsplittable corpus: no merges trained, encoding = char split
    val single = Seq((1L, "x y z")).toDF("doc_id", "text")
    val s = GraftOps.bpeEncode(single, rounds = 3).collect().head
    assert((s.getLong(1), s.getLong(2), s.getLong(3)) == ((3L, 3L, 3L)))
    intercept[IllegalArgumentException](GraftOps.bpeEncode(docs, 0))
  }

  test("chunkDocuments and sourceMixWeighted validate their arguments") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "src0")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException](GraftOps.chunkDocuments(docs, window = 0))
    intercept[IllegalArgumentException](
      GraftOps.chunkDocuments(docs, window = 4, stride = 5)) // stride > window
    intercept[IllegalArgumentException](
      GraftOps.sourceMixWeighted(docs, Map.empty, 100L))
    intercept[IllegalArgumentException](
      GraftOps.sourceMixWeighted(docs, Map("src0" -> -0.5), 100L))
    intercept[IllegalArgumentException](
      GraftOps.sourceMixWeighted(docs, Map("src0" -> Double.NaN), 100L))
    // an unlisted source is excluded: rate 0, nothing kept
    val r = GraftOps.sourceMixWeighted(docs, Map("other" -> 1.0), 100L)
      .collect().head
    assert(r.getAs[Long]("n_docs_kept") == 0L &&
      r.getAs[Long]("kept_tokens") == 0L &&
      r.getAs[Double]("weight") == 0.0)
  }

  test("Exact.roundN: portable floor spelling, non-finite pass-through") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val vals = Seq(2.0, -2.0, 1.23456789, -1.23456789, 0.0,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val out = vals.toDF("x")
      .select(col("x"), ops.Exact.round6(col("x")).as("r"),
        ops.Exact.roundN(col("x"), 2).as("r2"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    out.foreach { case (x, r6, r2) =>
      if (x.isNaN) { assert(r6.isNaN && r2.isNaN) }
      else if (x.isInfinite) {
        // Spark's floor(double) returns LONG (NaN -> 0, Inf -> Long.Max)
        // while DuckDB's floor preserves non-finites; the guard keeps the
        // two engines' spellings identical — a regression here silently
        // flips hash compares on any query with a degenerate group
        assert(r6 == x && r2 == x)
      } else {
        assert(r6 == math.floor(x * 1e6 + 0.5) / 1e6)
        assert(r2 == math.floor(x * 1e2 + 0.5) / 1e2)
      }
    }
  }

  test("Exact.roundN: a finite saturating magnitude fails loudly, not 1-ulp-silently") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // beyond 2^63/1e6 Spark's floor(double) saturates at Long.MaxValue
    // while DuckDB's multiply/divide round-trip returns x ± 1 ulp — no
    // spelling agrees, so the only honest behavior is a named error
    val e = intercept[Exception] {
      Seq(1e13).toDF("x").select(ops.Exact.round6(col("x"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("Exact.roundN(6)")),
      s"expected the roundN saturation error, got: $e")
    // just under the bound still rounds normally on both engines
    val ok = Seq(9.0e12).toDF("x")
      .select(ops.Exact.round6(col("x"))).head.getDouble(0)
    assert(ok == math.floor(9.0e12 * 1e6 + 0.5) / 1e6)
  }

  test("kmeans assigns every vector and yields k non-empty clusters") {
    import spark.implicits._
    // two tight blobs far apart, seeds 0 and 1 land one in each
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 10f)),
      (2L, Array(0.1f, 0f)), (3L, Array(10f, 10.1f)),
      (4L, Array(0f, 0.2f)), (5L, Array(9.9f, 10f)))
      .toDF("vec_id", "embedding")
    val r = ops.MlOps.kmeans(vecs, k = 2, iters = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.map(_._1).toSeq == Seq(0L, 1L))
    assert(r.map(_._2).sum == 6L)
    assert(r.forall(_._3 < 1.0)) // tight blobs -> tiny inertia
  }
}
