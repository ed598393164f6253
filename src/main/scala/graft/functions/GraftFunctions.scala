package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}

/** Column-API facade over graft's native Catalyst expressions, plus SQL
  * registration so `spark.sql("... graft_word_count(text) ...")` works.
  */
object GraftFunctions {

  /** Native one-pass word count (reference R9 semantics). */
  def word_count(c: Column): Column =
    GraftBridge.column(WordCount(GraftBridge.expression(c)))

  /** Native one-pass tokenizer (Go strings.Fields parity) -> array<string>. */
  def words(c: Column): Column =
    GraftBridge.column(Words(GraftBridge.expression(c)))

  /** Native one-pass word n-gram shingler -> array<string> (space-joined). */
  def shingles(c: Column, n: Int): Column =
    GraftBridge.column(Shingles(GraftBridge.expression(c), n))

  /** Native fused repetition counters over an array<string> token column
    * -> struct<n_tokens, max_unigram, distinct_bigrams, n_bigrams,
    * sum_word_len>.
    */
  def repetition_stats(c: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(c)))

  /** Native fused cosine similarity over two array<float> columns. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** [[cosine_sim]] over two array<tinyint> (int8-quantized) columns. */
  def cosine_sim_i8(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimI8(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Fused int8 quantization + prefilter bound + L2 norm over an
    * array<float> -> struct<qv: array<tinyint>, qeps: double,
    * nrm: double> (see [[VecQuantUtil.quantMeta]]).
    */
  def int8_quant(emb: Column): Column =
    GraftBridge.column(Int8Quant(GraftBridge.expression(emb)))

  /** Σ x² over an array<float> in double — the codegen zero-norm guard. */
  def sq_norm_f(emb: Column): Column =
    GraftBridge.column(SqNormF(GraftBridge.expression(emb)))

  /** sqrt(Σ x² exact in long) over an array<bigint> — the embed-family
    * norm column (overflow throws, the ANSI-guard parity).
    */
  def sq_norm_counts(cnts: Column): Column =
    GraftBridge.column(SqNormCounts(GraftBridge.expression(cnts)))

  /** L2-normalized array<float> from an array<bigint> count vector. */
  def l2_norm_counts(cnts: Column): Column =
    GraftBridge.column(L2NormCounts(GraftBridge.expression(cnts)))

  /** Native nearest-centroid assignment against a literal codebook ->
    * struct<dist: double, k: bigint>. `ids` sorted ascending (tie-break).
    */
  def nearest_centroid(emb: Column, ids: Seq[Long], cents: Seq[Seq[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(emb), ids, cents))

  /** Native 8-slot MinHash signature over an array<string> of shingles. */
  def minhash_sig(c: Column): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c)))

  /** Native 64-bit SimHash over an array<string> of words (16-hex). */
  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))

  /** Native fused Gopher rule counters over a line-structured text
    * -> struct<n_words, n_lines, sum_wlen, n_alpha, n_stop, n_hash,
    * n_dots, n_bullet, n_ell> (all bigint).
    */
  def gopher_stats(c: Column): Column =
    GraftBridge.column(GopherStats(GraftBridge.expression(c)))

  /** Native fused C4 line filter -> struct<n_lines, n_kept, cleaned>. */
  def c4_stats(c: Column, minWords: Int): Column =
    GraftBridge.column(C4Stats(GraftBridge.expression(c), minWords))

  /** Native hashed-feature weight sum: Σ weights[md5-bucket(token)]
    * over an array<string>, weight table baked into the plan.
    */
  def hashed_weight_sum(c: Column, weights: Seq[Long]): Column =
    GraftBridge.column(HashedWeightSum(GraftBridge.expression(c), weights))

  /** Native per-doc md5-bucket token counts -> array<bigint>[dim]. */
  def hashed_bucket_counts(c: Column, dim: Int): Column =
    GraftBridge.column(HashedBucketCounts(GraftBridge.expression(c), dim))

  /** Native dot product of a bucket-count array against a literal
    * weight table: Σ bc[i]·weights[i] (the [[hashed_weight_sum]] value
    * without re-tokenizing — see [[BucketDot]]).
    */
  def bucket_dot(c: Column, weights: Seq[Long]): Column =
    GraftBridge.column(BucketDot(GraftBridge.expression(c), weights))

  /** Native per-set token occurrence counts -> array<bigint>, one slot
    * per word set (sets baked into the plan as literals).
    */
  def token_set_counts(c: Column, sets: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenSetCounts(GraftBridge.expression(c), sets))

  /** Native nTok-token consecutive line windows -> array<string>. */
  def token_lines(c: Column, nTok: Int): Column =
    GraftBridge.column(TokenLines(GraftBridge.expression(c), nTok))

  /** Native per-position line-window md5 hex digests -> array<string>
    * (every occurrence; [[LineDigests]]' non-distinct sibling).
    */
  def line_digest_seq(c: Column, nTok: Int): Column =
    GraftBridge.column(LineDigestSeq(GraftBridge.expression(c), nTok))

  /** Native per-position k-token WINDOW digests -> array<bigint> (the
    * overlapping sibling of [[line_digest_seq]]'s non-overlapping
    * lines; 64-bit rolling hash, O(text) per document).
    */
  def shingle_digest_seq(c: Column, k: Int): Column =
    GraftBridge.column(ShingleDigestSeq(GraftBridge.expression(c), k))

  /** Fused exact-substring strip against a broadcast duplicated-window
    * digest set -> struct<n_tokens, n_removed, cleaned>.
    */
  def substring_strip(c: Column, bc: org.apache.spark.broadcast.Broadcast[LongSet],
      k: Int): Column =
    GraftBridge.column(SubstringStrip(GraftBridge.expression(c), bc, k))

  /** Join-path exact-substring rebuild from explicit ascending
    * duplicated-window start positions -> the same struct.
    */
  def drop_covered_spans(text: Column, starts: Column, k: Int): Column =
    GraftBridge.column(DropCoveredSpans(
      GraftBridge.expression(text), GraftBridge.expression(starts), k))

  /** Native derived-line builder: nTok-token lines + deterministic
    * terminal-punctuation suffix keyed on (doc_id, line index).
    */
  def suffix_lines(text: Column, docId: Column, nTok: Int): Column =
    GraftBridge.column(SuffixLines(
      GraftBridge.expression(text), GraftBridge.expression(docId), nTok))

  /** Bounded-buffer histogram aggregate over [lo, hi) with n buckets. */
  def histogram(c: Column, lo: Double, hi: Double, n: Int): Column =
    GraftBridge.column(
      HistogramAgg(GraftBridge.expression(c), lo, hi, n).toAggregateExpression())

  /** Per-line block-gate evidence: array<struct<nc, nw, ns, nl>> (see
    * [[HtmlBlockStats]]).
    */
  def html_block_stats(c: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(
      HtmlBlockStats(GraftBridge.expression(c), stopwords))

  /** Wide-bucket n-gram histogram for the language classifier's
    * training pass (see [[LangBucketCounts]]).
    */
  def lang_bucket_counts(c: Column, dim: Int): Column =
    GraftBridge.column(LangBucketCounts(GraftBridge.expression(c), dim))

  /** Code-point character n-grams (see [[CharNgrams]]). */
  def char_ngrams(c: Column, n: Int): Column =
    GraftBridge.column(CharNgrams(GraftBridge.expression(c), n))

  /** Multi-class hashed weight sums: array<bigint>, one Σ per table,
    * one md5 per token (see [[HashedWeightSums]]).
    */
  def hashed_weight_sums(c: Column, tables: Seq[Seq[Long]]): Column =
    GraftBridge.column(HashedWeightSums(GraftBridge.expression(c), tables))

  /** Trained-BPE token-id emission over a word array: array<int> of
    * concatenated token ids (see [[BpeEncodeIds]] / [[BpeIdEncoder]]).
    */
  def bpe_encode_ids(wordsCol: Column, encoder: BpeIdEncoder): Column =
    GraftBridge.column(
      BpeEncodeIds(GraftBridge.expression(wordsCol), encoder))

  /** Inverse of [[bpe_encode_ids]]: id stream -> concatenated token
    * text through the dense id→token table (see [[BpeDecodeIds]]).
    */
  /** Byte-level BPE encode + decode-roundtrip in one fused pass ->
    * struct<n_pretokens, n_tokens, ids, lossless>.
    */
  def bpe_byte_encode(c: Column, enc: BpeByteEncoder): Column =
    GraftBridge.column(BpeByteEncode(GraftBridge.expression(c), enc))

  def bpe_decode_ids(idsCol: Column, tokens: Array[String]): Column =
    GraftBridge.column(
      BpeDecodeIds(GraftBridge.expression(idsCol), tokens))

  /** Element-wise sum aggregate of dim-slot array<bigint> columns. */
  def vec_sum(c: Column, dim: Int): Column =
    GraftBridge.column(
      LongVecSumAgg(GraftBridge.expression(c), dim).toAggregateExpression())

  /** Capped element-count map aggregate over array<string> rows:
    * map<string,bigint> of per-element occurrence counts, or NULL past
    * `maxKeys` distinct elements (the caller's distributed-path
    * fallback signal).
    */
  def elem_counts(c: Column, maxKeys: Int): Column =
    GraftBridge.column(
      ElemCountMapAgg(GraftBridge.expression(c), maxKeys).toAggregateExpression())

  /** Capped per-key row-count map aggregate over a BIGINT column:
    * map<bigint,bigint>, or NULL past `maxKeys` distinct keys.
    */
  def key_counts(c: Column, maxKeys: Int): Column =
    GraftBridge.column(
      LongCountMapAgg(GraftBridge.expression(c), maxKeys).toAggregateExpression())

  /** HTML → text extraction: struct<text, main_text, n_lines, n_kept>
    * (see [[HtmlExtract]] / [[HtmlTextUtil]] for the rule chain).
    */
  def html_extract(c: Column): Column =
    GraftBridge.column(HtmlExtract(GraftBridge.expression(c)))

  /** Per-line extraction evidence: array<struct<line, n_chars,
    * n_link_chars>> (see [[HtmlLineStats]]).
    */
  def html_lines(c: Column): Column =
    GraftBridge.column(HtmlLineStats(GraftBridge.expression(c)))


  /** Shared literal-integer argument extraction for the SQL builders:
    * fails with a contract-naming message (probe `resolved` before
    * foldable/dataType — both throw UnresolvedException on an
    * unresolved column, masking the message) and validates the int
    * range — `Number.intValue()` alone would silently WRAP a BIGINT
    * literal (e.g. 4294967299 -> 3) into a plausible-but-wrong
    * parameter.
    */
  private def literalInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = {
    require(e.resolved && e.foldable && {
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType)
    }, s"$what must be a literal integer")
    val v = e.eval()
    require(v != null, s"$what must be a non-null literal integer")
    val l = v.asInstanceOf[Number].longValue()
    require(l >= Int.MinValue && l <= Int.MaxValue,
      s"$what out of int range: $l")
    l.toInt
  }

  /** Register SQL names for the native expressions (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_count", exprs => WordCount(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_sim_i8", exprs => CosineSimI8(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_repetition_stats", exprs => RepetitionStats(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig", exprs => MinHashSig(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_words", exprs => Words(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_html_extract", exprs => HtmlExtract(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_html_lines", exprs => HtmlLineStats(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gopher_stats", exprs => GopherStats(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hashed_weight_sum", exprs => {
        require(exprs.length == 2,
          "graft_hashed_weight_sum(ws, weights) expects exactly 2 arguments")
        require(exprs(1).resolved && exprs(1).foldable &&
          exprs(1).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
          "graft_hashed_weight_sum weights must be a literal array of integers")
        val arr = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(arr != null && arr.numElements() > 0,
          "graft_hashed_weight_sum weights must be a non-empty literal array")
        val et = exprs(1).dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        val ws = (0 until arr.numElements()).map { i =>
          // reject null slots loudly: getLong on a null slot would
          // silently read weight 0, corrupting every score that hashes
          // to that bucket
          require(!arr.isNullAt(i),
            s"graft_hashed_weight_sum weights must not contain NULL (slot $i)")
          import org.apache.spark.sql.types._
          et match {
            case LongType => arr.getLong(i)
            case IntegerType => arr.getInt(i).toLong
            case ShortType => arr.getShort(i).toLong
            case ByteType => arr.getByte(i).toLong
            case other => throw new IllegalArgumentException(
              s"graft_hashed_weight_sum weights must be integers, got $other")
          }
        }
        HashedWeightSum(exprs(0), ws)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bucket_dot", exprs => {
        require(exprs.length == 2,
          "graft_bucket_dot(bc, weights) expects exactly 2 arguments")
        require(exprs(1).resolved && exprs(1).foldable &&
          exprs(1).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
          "graft_bucket_dot weights must be a literal array of integers")
        val arr = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(arr != null && arr.numElements() > 0,
          "graft_bucket_dot weights must be a non-empty literal array")
        val et = exprs(1).dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        val ws = (0 until arr.numElements()).map { i =>
          require(!arr.isNullAt(i),
            s"graft_bucket_dot weights must not contain NULL (slot $i)")
          import org.apache.spark.sql.types._
          et match {
            case LongType => arr.getLong(i)
            case IntegerType => arr.getInt(i).toLong
            case ShortType => arr.getShort(i).toLong
            case ByteType => arr.getByte(i).toLong
            case other => throw new IllegalArgumentException(
              s"graft_bucket_dot weights must be integers, got $other")
          }
        }
        BucketDot(exprs(0), ws)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hashed_bucket_counts", exprs => {
        require(exprs.length == 2,
          "graft_hashed_bucket_counts(ws, dim) expects exactly 2 arguments")
        require(exprs(1).resolved && exprs(1).foldable &&
          exprs(1).dataType == org.apache.spark.sql.types.IntegerType,
          "graft_hashed_bucket_counts dim must be a literal INT")
        val dim = exprs(1).eval().asInstanceOf[Int]
        HashedBucketCounts(exprs(0), dim)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_set_counts", exprs => {
        require(exprs.length == 2,
          "graft_token_set_counts(ws, sets) expects exactly 2 arguments")
        val ok = exprs(1).resolved && exprs(1).foldable && {
          exprs(1).dataType match {
            case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(
                _: org.apache.spark.sql.types.StringType, _), _) => true
            case _ => false
          }
        }
        require(ok,
          "graft_token_set_counts sets must be a literal array of string arrays")
        val outer = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(outer != null && outer.numElements() > 0,
          "graft_token_set_counts sets must be non-empty")
        val sets = (0 until outer.numElements()).map { i =>
          require(!outer.isNullAt(i),
            s"graft_token_set_counts sets must not contain NULL (slot $i)")
          val inner = outer.getArray(i)
          (0 until inner.numElements()).map { j =>
            require(!inner.isNullAt(j),
              s"graft_token_set_counts set $i must not contain NULL (slot $j)")
            inner.getUTF8String(j).toString
          }
        }
        TokenSetCounts(exprs(0), sets)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_lines", exprs => {
        require(exprs.length == 2,
          "graft_token_lines(text, n_tok) expects exactly 2 arguments")
        TokenLines(exprs(0), literalInt(exprs(1), "graft_token_lines n_tok"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_c4_stats", exprs => {
        require(exprs.length == 2,
          "graft_c4_stats(text, min_words) expects exactly 2 arguments")
        C4Stats(exprs(0), literalInt(exprs(1), "graft_c4_stats min_words"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_suffix_lines", exprs => {
        require(exprs.length == 3,
          "graft_suffix_lines(text, doc_id, n_tok) expects exactly 3 arguments")
        SuffixLines(exprs(0), exprs(1),
          literalInt(exprs(2), "graft_suffix_lines n_tok"))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => {
        require(exprs.length == 2,
          "graft_shingles(text, n) expects exactly 2 arguments")
        Shingles(exprs(0), literalInt(exprs(1), "graft_shingles n"))
      },
      "scala_udf")
  }
}
