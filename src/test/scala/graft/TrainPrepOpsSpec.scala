package graft

import org.apache.spark.sql.functions._

import ops.TrainPrepOps

/** Behavior pins for the training-prep operators (q_trigram_backoff /
  * q_shuffle_shards / q_domain_quality are the oracle gates; these pin
  * the semantics on crafted inputs — every backoff arm firing in one
  * document, partitioning-independence of the shuffle, the >= boundary
  * of the domain gate).
  */
class TrainPrepOpsSpec extends SparkSpec {

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("BPE encode: distributed-join spelling == literal tokenizer on the fixture corpus") {
    // the firstLineDedup dual-path discipline applied to the tokenizer:
    // under the alphabet cap both spellings must agree id-for-id
    val docs = Tables.documents(spark, sfDir)
    val tok = TrainPrepOps.bpeTokenizer(docs, TrainPrepOps.TokRounds)
    val lit = GraftOps.tokenIds(docs, TrainPrepOps.TokRounds)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](2))).toMap
    val dist = TrainPrepOps.tokenIdsDistributed(docs, tok.merges)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](2))).toMap
    assert(dist.size == lit.size)
    assert(dist == lit)
  }

  test("BPE alphabet over the cap: literal tokenizer fails loudly, " +
    "tokenIdsAuto degrades to the distributed spelling with exact ids") {
    import spark.implicits._
    // synthetic over-cap corpus: MaxAlphabet + 64 distinct code points
    // (supplementary planes — 2 UTF-16 units each, so this also pins
    // code-point splitting), one two-char word per doc
    val n = TrainPrepOps.MaxAlphabet + 64
    val rows = (0 until n).map { i =>
      val c = new String(Character.toChars(0x20000 + i))
      (i.toLong, "srcX", c + c)
    }
    val over = rows.toDF("doc_id", "source", "text")
    val ex = intercept[IllegalArgumentException] {
      TrainPrepOps.bpeTokenizer(over, 1)
    }
    assert(ex.getMessage.contains("tokenIdsAuto"), ex.getMessage)
    val ids = TrainPrepOps.tokenIdsAuto(over, 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](2))).toMap
    assert(ids.size == n)
    // every pair ties at count 1 → the merge is the smallest pair
    // string = the doc-0 character doubled; its ids collapse to the
    // merge id nAlpha + 0, every other doc stays [tid, tid] with
    // tid = its code-point rank (== its index, insertion is ascending)
    assert(ids(0L) == Seq(n))
    assert(ids(1L) == Seq(1, 1))
    assert(ids((n - 1).toLong) == Seq(n - 1, n - 1))
  }

  test("byte-level BPE: lossless decode on hostile unicode/whitespace, quirk-exact merges") {
    import spark.implicits._
    // texts the char-level tokenizer CANNOT roundtrip: leading/multi
    // space, tabs+newlines, supplementary-plane code points (4-byte
    // UTF-8), combining marks, empty text, punctuation runs
    val nasty = Seq(
      (0L, "src", "  leading double space"),
      (1L, "src", "tabs\tand\nnewlines \r\n mixed\f!"),
      (2L, "src", new String(Character.toChars(0x2070E)) + " áccent  é"),
      (3L, "src", ""),
      (4L, "src", "!!!???...   ---"),
      (5L, "src", "word"),
      (6L, "src", "aaaa aaaa aaaa aaaa")) // byte-run quirk fodder
      .toDF("doc_id", "source", "text")
    val got = TrainPrepOps.byteTokenIds(nasty, rounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    got.foreach { case (id, (_, _, lossless)) =>
      assert(lossless, s"doc $id failed the byte-level decode roundtrip")
    }
    assert(got(3L) == ((0L, 0L, true)), "empty doc: 0 pretokens, 0 tokens, lossless")
    // pretoken concat == text is the structural half of losslessness;
    // pin it directly for the multi-space + tab/newline docs
    val pre = nasty.select(col("doc_id"),
        concat_ws("", regexp_extract_all(col("text"),
          lit(TrainPrepOps.BytePreRegex), lit(0))).as("cat"),
        col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    pre.foreach { case (id, cat, text) =>
      assert(cat == text, s"doc $id: pretoken concatenation != text")
    }
    // trainer quirk pin: "aaaa" = 61 61 61 61; merging pair "61 61"
    // under the boundary-padded replace gives [6161, 61, 61] (NOT
    // [6161, 6161]) — the documented non-overlapping resume semantics,
    // which the encoder must reproduce symbol-for-symbol
    val runOnly = Seq((0L, "src", "aaaa")).toDF("doc_id", "source", "text")
    val merges = TrainPrepOps.bpeByteMerges(runOnly, 1)
    assert(merges == Seq("61 61"), s"unexpected first merge: $merges")
    val ids = TrainPrepOps.byteTokenIds(runOnly, 1).collect()
      .map(r => (r.getLong(2), r.getBoolean(4))).head
    assert(ids == ((3L, true)), s"quirk run must encode to 3 tokens: $ids")
  }

  test("trigram stupid backoff: every arm of the chain fires and scores exactly") {
    import spark.implicits._
    // train: unigrams a:3 b:3 c:2 d:1 (N=9); bigrams (a,b):3 (b,c):2
    // (c,a):1 (b,d):1; trigrams (a,b,c):2 (b,c,a):1 (c,a,b):1 (a,b,d):1
    val train = Seq((0L, "a b c a b d"), (2L, "a b c")).toDF("doc_id", "text")
    val lm = TrainPrepOps.trigramBackoffLm(train)
    // score "a b c x b d": (a,b,c) known trigram; (b,c,x) unknown at
    // every order -> skipped; (c,x,b) grounds only at the unigram b;
    // (x,b,d) backs off to the bigram (b,d)
    val score = Seq((1L, "a b c x b d")).toDF("doc_id", "text")
    val row = TrainPrepOps.scoreTrigramLm(score, lm).head
    assert(row.getLong(1) == 4L, "n_positions")
    assert(row.getLong(2) == 3L, "n_scored")
    val expected = r6((r6(math.log(2.0 / 3)) +
      r6(math.log(0.16 * (3.0 / 9))) +
      r6(math.log(0.4 * (1.0 / 3)))) / 3)
    assert(row.getDouble(3) == expected,
      s"avg_logprob ${row.getDouble(3)} != $expected")
  }

  test("trigram literal and distributed-join scoring paths state identical values") {
    // the engine self-selects the physical form by measured type count;
    // both forms must agree bit-for-bit (the knnLabel dual-path pin) —
    // run on the real fixture corpus so every backoff arm and the
    // driver-side scalar mirror of the model arithmetic are exercised
    val docs = Tables.documents(spark, sfDir)
    val train = docs.filter(col("doc_id") % 10 === 0)
    val score = docs.filter(col("doc_id") % 10 =!= 0)
    val lit = TrainPrepOps.trigramBackoffLm(train)
    assert(lit.literal.isDefined, "fixture model must take the literal path")
    val dist = TrainPrepOps.trigramBackoffLm(train, maxLiteralTypes = 0)
    assert(dist.literal.isEmpty)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = key(TrainPrepOps.scoreTrigramLm(score, lit))
    val b = key(TrainPrepOps.scoreTrigramLm(score, dist))
    assert(a == b)
    assert(a.nonEmpty)
    // and the model TABLES themselves carry identical rows
    def rows(lm: TrainPrepOps.TrigramLm) =
      lm.model.orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows(lit) == rows(dist))
  }

  test("trigram distributed branch past the broadcast gate: same model, keyed joins") {
    // r10 regression: the distributed conditioning join FORCED
    // broadcast(pc) regardless of the measured type count — the exact
    // driver-death the branch exists to avoid at billion-type scale.
    // Gate=0 forces the keyed spelling everywhere; the model must be
    // value-identical and flagged non-broadcastable for scoring.
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 20 === 0).select("doc_id", "text")
    val hinted = TrainPrepOps.trigramBackoffLm(docs, maxLiteralTypes = 0)
    val keyed = TrainPrepOps.trigramBackoffLm(docs, maxLiteralTypes = 0,
      maxBroadcastTypes = 0)
    assert(hinted.broadcastable && !keyed.broadcastable)
    def rows(lm: TrainPrepOps.TrigramLm) =
      lm.model.orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows(hinted) == rows(keyed))
    assert(rows(keyed).nonEmpty)
  }

  test("trigram scoring: zero-groundable document yields no row") {
    import spark.implicits._
    val train = Seq((0L, "a b c")).toDF("doc_id", "text")
    val lm = TrainPrepOps.trigramBackoffLm(train)
    val score = Seq((1L, "x y z w"), (3L, "a b c")).toDF("doc_id", "text")
    val got = TrainPrepOps.scoreTrigramLm(score, lm)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L), s"expected only the in-vocabulary doc, got $got")
  }

  test("shuffleShards: deterministic, partitioning-independent, in range") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
      TrainPrepOps.shuffleShards(df, "doc_id", numShards = 7, seed = 9)
        .select("doc_id", "shard", "shuffle_h")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val a = assign(docs)
    val b = assign(docs.repartition(13))
    assert(a == b, "assignment must be a pure function of (id, seed)")
    assert(a.values.forall { case (s, _) => s >= 0 && s < 7 })
    // the digest is the plain md5 of "id:seed" — auditable outside Spark
    val md = java.security.MessageDigest.getInstance("MD5")
    val h5 = md.digest("5:9".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(a(5L)._2 == h5)
    // a different seed is a different permutation
    val c = TrainPrepOps.shuffleShards(docs, "doc_id", 7, 10)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.map { case (k, (s, _)) => k -> s } != c)
  }

  test("shuffleShards rejects colliding input columns") {
    import spark.implicits._
    val df = Seq((1L, 0L)).toDF("doc_id", "shard")
    val e = intercept[IllegalArgumentException] {
      TrainPrepOps.shuffleShards(df, "doc_id", 4, 1)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("domainQualityFilter keeps domains at or above the corpus mean") {
    import spark.implicits._
    // corpus mean = (1 + 1 + 0 + 0 + 0.5) / 5 = 0.5: domain a (mean 1)
    // kept, b (mean 0) dropped, c (mean 0.5) kept — the >= boundary
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 1.0),
      (3L, "b", 0.0), (4L, "b", 0.0),
      (5L, "c", 0.5)).toDF("doc_id", "domain", "quality")
    val kept = TrainPrepOps.domainQualityFilter(df, "domain", "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L), s"got $kept")
  }

  test("domainQualityFilter: literal IN-set and distributed semi-join paths agree") {
    // the engine self-selects by measured domain count; the literal
    // driver-side mean must be the exact mirror of the distributed
    // decimal arithmetic — run on the real fixture quality signal
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        concat(lit("d"), col("doc_id") % 97, lit("."), col("source")).as("domain"),
        (length(col("text")) % 100).cast("double").as("quality"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val lit_ = key(TrainPrepOps.domainQualityFilter(docs, "domain", "quality"))
    val dist = key(TrainPrepOps.domainQualityFilter(docs, "domain", "quality",
      maxLiteralDomains = 0))
    assert(lit_ == dist)
    assert(lit_.nonEmpty && lit_.size < docs.count())
  }

  test("domainQualityFilter literal path probes a broadcast set, not In-literals") {
    import spark.implicits._
    // r10 regression: the keep set rode back as isin(...) — near the 2M
    // cap that is millions of Literal nodes in every analyzer walk. The
    // literal path must now plan ONE graft_strset_contains probe. (A
    // parquet-backed corpus: on a local Seq the optimizer's
    // ConvertToLocalRelation evaluates the probe away at plan time.)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source").as("domain"),
        (length(col("text")) % 100).cast("double").as("quality"))
    val kept = TrainPrepOps.domainQualityFilter(docs, "domain", "quality")
    val plan = kept.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_strset_contains"), plan)
    assert(!plan.contains(" IN ("), plan)
    assert(kept.count() > 0 && kept.count() < docs.count())
    // semantics unchanged on a tiny local corpus (values, not the plan):
    // corpus mean (1+1+0+0.5)/4 = 0.625 — only domain a (mean 1) stays
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "b", 0.0), (4L, "c", 0.5))
      .toDF("doc_id", "domain", "quality")
    val keptIds = TrainPrepOps.domainQualityFilter(df, "domain", "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == Set(1L, 2L))
  }

  test("domainQualityFilter preserves the caller's schema and rejects reserved names") {
    import spark.implicits._
    val df = Seq((1L, "a", 0.9, "x")).toDF("doc_id", "domain", "quality", "extra")
    val out = TrainPrepOps.domainQualityFilter(df, "domain", "quality")
    assert(out.columns.toSeq == Seq("domain", "doc_id", "quality", "extra") ||
      out.columns.toSet == df.columns.toSet)
    val bad = df.withColumn("__graft_corpus_q", lit(1.0))
    val e = intercept[IllegalArgumentException] {
      TrainPrepOps.domainQualityFilter(bad, "domain", "quality")
    }
    assert(e.getMessage.contains("__graft_corpus_q"))
  }

  // domainCap's mega-domain skew guard is Spark's rank-limit pushdown:
  // the row_number-then-filter shape must plan a PARTIAL
  // WindowGroupLimit below the exchange (map-side per-domain top-cap —
  // the measured 2x-cheaper equivalent of the salted pre-rank the r16
  // scaladoc proposed; see DomainCapAB). A respelling that breaks the
  // pushdown would silently put a flooded domain back into ONE
  // partition — fail here, by name. Values pinned on a flooded frame
  // with heavy score ties (the tie-break doc_id order is where a broken
  // partial limit would first diverge).
  test("domainCap: rank-limit pushdown fires and flood winners are exact") {
    import spark.implicits._
    // two domains (a constant domain would let the optimizer drop the
    // partition key and plan TakeOrderedAndProject instead): 'mega'
    // holds 99.99% of rows, 'tiny' exactly one
    val flood = spark.range(10000)
      .select(col("id").as("doc_id"),
        when(col("id") === 9999, lit("tiny")).otherwise(lit("mega")).as("domain"),
        (col("id") % 3).cast("double").as("score"))
    val capped = TrainPrepOps.domainCap(flood, "domain", "score", "doc_id", 5)
    val ids = capped.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(2L, 5L, 8L, 11L, 14L, 9999L))
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("BPE decode roundtrips every fixture document exactly") {
    // the tokenizer-integrity contract behind q_bpe_roundtrip:
    // decode(encode(words)) == concat(words, '') for EVERY document —
    // a lost/reordered character anywhere fails the doc it happens in
    val got = SparkEntry.queries("q_bpe_roundtrip")(spark, sfDir)
      .select("doc_id", "roundtrip_ok").collect()
    assert(got.nonEmpty)
    val bad = got.filter(!_.getBoolean(1)).map(_.getLong(0))
    assert(bad.isEmpty, s"roundtrip failed for docs ${bad.take(5).mkString(",")}")
  }

  test("BPE decode renders a foreign id as U+FFFD instead of failing") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val tokens = Array("a", "b", "ab")
    val ids = new GenericArrayData(Array[Any](2, -1, 0, 99))
    val out = graft.functions.BpeDecodeUtil.decode(tokens, ids).toString
    assert(out == "ab�a�")
  }
}
