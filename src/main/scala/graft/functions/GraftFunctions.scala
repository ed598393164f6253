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

  /** Native nTok-token consecutive line windows -> array<string>. */
  def token_lines(c: Column, nTok: Int): Column =
    GraftBridge.column(TokenLines(GraftBridge.expression(c), nTok))

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
      "graft_token_lines", exprs => {
        require(exprs.length == 2,
          "graft_token_lines(text, n_tok) expects exactly 2 arguments")
        require(exprs(1).resolved && exprs(1).foldable && {
          import org.apache.spark.sql.types._
          Seq(ByteType, ShortType, IntegerType, LongType)
            .contains(exprs(1).dataType)
        }, "graft_token_lines n_tok must be a literal integer")
        val nt = exprs(1).eval()
        require(nt != null, "graft_token_lines n_tok must be a non-null literal integer")
        TokenLines(exprs(0), nt.asInstanceOf[Number].intValue())
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_c4_stats", exprs => {
        require(exprs.length == 2,
          "graft_c4_stats(text, min_words) expects exactly 2 arguments")
        require(exprs(1).resolved && exprs(1).foldable && {
          import org.apache.spark.sql.types._
          Seq(ByteType, ShortType, IntegerType, LongType)
            .contains(exprs(1).dataType)
        }, "graft_c4_stats min_words must be a literal integer")
        val mw = exprs(1).eval()
        require(mw != null, "graft_c4_stats min_words must be a non-null literal integer")
        C4Stats(exprs(0), mw.asInstanceOf[Number].intValue())
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_suffix_lines", exprs => {
        require(exprs.length == 3,
          "graft_suffix_lines(text, doc_id, n_tok) expects exactly 3 arguments")
        require(exprs(2).resolved && exprs(2).foldable && {
          import org.apache.spark.sql.types._
          Seq(ByteType, ShortType, IntegerType, LongType)
            .contains(exprs(2).dataType)
        }, "graft_suffix_lines n_tok must be a literal integer")
        val nt = exprs(2).eval()
        require(nt != null, "graft_suffix_lines n_tok must be a non-null literal integer")
        SuffixLines(exprs(0), exprs(1), nt.asInstanceOf[Number].intValue())
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => {
        // fail with a contract-naming message instead of a bare
        // UnsupportedOperationException from eval() on an unresolved
        // column (the builder runs at analysis time)
        require(exprs.length == 2,
          "graft_shingles(text, n) expects exactly 2 arguments")
        // probe resolved before foldable/dataType: both throw
        // UnresolvedException on an unresolved column argument, which
        // would mask the contract-naming message below
        require(exprs(1).resolved && exprs(1).foldable && {
          import org.apache.spark.sql.types._
          Seq(ByteType, ShortType, IntegerType, LongType)
            .contains(exprs(1).dataType)
        }, "graft_shingles n must be a literal integer")
        val nVal = exprs(1).eval()
        require(nVal != null, "graft_shingles n must be a non-null literal integer")
        Shingles(exprs(0), nVal.asInstanceOf[Number].intValue())
      },
      "scala_udf")
  }
}
