package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused one-pass counters for the rule-based curation filters
  * (FilterOps). The composable-builtins spellings iterate the token /
  * line arrays through interpreted higher-order lambdas — ~10 passes
  * per document, none inside whole-stage codegen (the
  * q_repetition_signals lesson, RepetitionStats.scala:11); each fused
  * pass here is O(text) inside codegen. Semantics are builtin-parity
  * BY CONSTRUCTION and property-checked in FilterExprsSpec:
  * tokenization is Go strings.Fields ([[WordCountUtil.isGoSpace]]),
  * line splitting is `split(text, "\n")` with trailing empties kept
  * (n_lines = count('\n') + 1), and the `...` count is the
  * non-overlapping left-to-right scan both regex engines implement.
  */
object FilterExprsUtil {

  /** The canonical English-stopword probe set. The [[gopherStats]]
    * scanner below unrolls EXACTLY these five words (regionMatches +
    * bitmask) — `TextOps.EnStop` aliases this val so the oracle SQL
    * and every builtins spelling read the same list, and editing the
    * set means editing the scanner in this same file (the parity
    * property suite catches a missed update).
    */
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Gopher rule counters over a line-structured text:
    * (n_words, n_lines, sum_wlen, n_alpha, n_stop, n_hash, n_dots,
    * n_bullet, n_ell). n_stop counts DISTINCT members of the EnStop
    * set {the, a, of, and, to} present as whole tokens; n_alpha counts
    * tokens containing >= 1 ASCII letter; n_bullet / n_ell count lines
    * starting with "- " / "* " / "• " and ending with "...".
    */
  def gopherStats(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    var nWords = 0L; var sumWlen = 0L; var nAlpha = 0L
    var nHash = 0L; var nDots = 0L
    var nLines = 1L; var nBullet = 0L; var nEll = 0L
    var stopMask = 0
    var start = -1
    var tokHasAlpha = false
    var lineStart = 0
    var dotSkipUntil = 0

    def endToken(endIdx: Int): Unit =
      if (start >= 0) {
        nWords += 1
        sumWlen += str.codePointCount(start, endIdx)
        if (tokHasAlpha) nAlpha += 1
        val tl = endIdx - start
        if (tl == 3) {
          if (str.regionMatches(start, "the", 0, 3)) stopMask |= 1
          else if (str.regionMatches(start, "and", 0, 3)) stopMask |= 2
        } else if (tl == 2) {
          if (str.regionMatches(start, "of", 0, 2)) stopMask |= 4
          else if (str.regionMatches(start, "to", 0, 2)) stopMask |= 8
        } else if (tl == 1 && str.charAt(start) == 'a') stopMask |= 16
        start = -1
        tokHasAlpha = false
      }

    def endLine(endIdx: Int): Unit = {
      val ls = lineStart
      if (endIdx - ls >= 2 && str.charAt(ls + 1) == ' ' &&
          (str.charAt(ls) == '-' || str.charAt(ls) == '*' ||
            str.charAt(ls) == '•'))
        nBullet += 1
      if (endIdx - ls >= 3 && str.charAt(endIdx - 1) == '.' &&
          str.charAt(endIdx - 2) == '.' && str.charAt(endIdx - 3) == '.')
        nEll += 1
    }

    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp == '\n') {
        endToken(i); endLine(i)
        nLines += 1
        lineStart = i + 1
      } else if (WordCountUtil.isGoSpace(cp)) {
        endToken(i)
      } else {
        if (start < 0) { start = i; tokHasAlpha = false }
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) tokHasAlpha = true
        if (cp == '#') nHash += 1
        if (cp == '.' && i >= dotSkipUntil && i + 3 <= len &&
            str.charAt(i + 1) == '.' && str.charAt(i + 2) == '.') {
          nDots += 1
          dotSkipUntil = i + 3
        }
      }
      i += Character.charCount(cp)
    }
    endToken(len); endLine(len)
    InternalRow(nWords, nLines, sumWlen, nAlpha,
      java.lang.Integer.bitCount(stopMask).toLong, nHash, nDots, nBullet, nEll)
  }

  /** C4 line filter in one pass: (n_lines, n_kept, cleaned) where kept
    * lines carry >= minWords tokens AND end in `.` / `!` / `?`, and
    * `cleaned` is the kept lines re-joined with '\n'. The terminal
    * check is LAST CHAR equality — RE2 `[.!?]$` semantics, what the
    * DuckDB oracle evaluates — deliberately NOT Java's `$`, which also
    * matches before a final \r / U+0085 / U+2028 / U+2029 (a Spark
    * `rlike("[.!?]$")` spelling would keep a line ending "." + U+2028
    * that the oracle rejects; pinned in FilterExprsSpec).
    */
  def c4Stats(s: UTF8String, minWords: Int): InternalRow = {
    val str = s.toString
    val len = str.length
    var nLines = 0L; var nKept = 0L
    val cleaned = new java.lang.StringBuilder()
    var lineStart = 0
    var i = 0
    def endLine(endIdx: Int): Unit = {
      nLines += 1
      var words = 0
      var inTok = false
      var j = lineStart
      while (j < endIdx && words < minWords) {
        val cp = str.codePointAt(j)
        if (WordCountUtil.isGoSpace(cp)) inTok = false
        else if (!inTok) { inTok = true; words += 1 }
        j += Character.charCount(cp)
      }
      val lastOk = endIdx > lineStart && {
        val c = str.charAt(endIdx - 1)
        c == '.' || c == '!' || c == '?'
      }
      if (words >= minWords && lastOk) {
        if (nKept > 0) cleaned.append('\n')
        cleaned.append(str, lineStart, endIdx)
        nKept += 1
      }
    }
    while (i < len) {
      if (str.charAt(i) == '\n') { endLine(i); lineStart = i + 1 }
      i += 1
    }
    endLine(len)
    InternalRow(nLines, nKept, UTF8String.fromString(cleaned.toString))
  }

  /** `nTok`-token consecutive line windows (the line-segmentation both
    * dedup/boilerplate operators share): tokens i·nTok … i·nTok+nTok−1
    * space-joined, tail window clamped. One tokenize + build pass.
    */
  def tokenLines(s: UTF8String, nTok: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = WordsUtil.tokenize(s.toString)
    val n = toks.size
    val m = (n + nTok - 1) / nTok
    val arr = new Array[AnyRef](m)
    var li = 0
    var i = 0
    while (i < n) {
      val end = math.min(i + nTok, n)
      val sb = new java.lang.StringBuilder(toks.get(i))
      var j = i + 1
      while (j < end) { sb.append(' ').append(toks.get(j)); j += 1 }
      arr(li) = UTF8String.fromString(sb.toString)
      li += 1
      i = end
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  private def md5Hex(md: java.security.MessageDigest, line: String): String = {
    md.reset()
    val dig = md.digest(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new java.lang.StringBuilder(32)
    var k = 0
    while (k < dig.length) {
      hex.append(Character.forDigit((dig(k) >> 4) & 0xf, 16))
      hex.append(Character.forDigit(dig(k) & 0xf, 16))
      k += 1
    }
    hex.toString
  }

  /** One-pass boilerplate strip against a broadcast set of boiler-line
    * md5 HEX digests: [[tokenLines]] segmentation, per-line md5, drop
    * members, rejoin survivors with ' ' in original order. Value parity
    * with the join spelling (explode + flag join + ordered
    * collect_list + array_join(' ')) is exact: same tokenizer, same
    * line windows, same digest function, same joiner.
    */
  def boilerStrip(set: StrSet, s: UTF8String, nTok: Int): InternalRow = {
    val toks = WordsUtil.tokenize(s.toString)
    val n = toks.size
    val md = java.security.MessageDigest.getInstance("MD5")
    var nLines = 0L
    var nBoiler = 0L
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val end = math.min(i + nTok, n)
      val lb = new java.lang.StringBuilder(toks.get(i))
      var j = i + 1
      while (j < end) { lb.append(' ').append(toks.get(j)); j += 1 }
      val line = lb.toString
      nLines += 1
      if (set.s.contains(md5Hex(md, line))) nBoiler += 1
      else {
        if (out.length() > 0) out.append(' ')
        out.append(line)
      }
      i = end
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nLines, nBoiler, UTF8String.fromString(out.toString)))
  }

  /** Per-document DISTINCT md5 hex digests of the [[tokenLines]]
    * windows — the corpus side of the boiler FREQUENCY pass in one
    * fused scan. Per-doc dedup here turns the downstream
    * doc-frequency aggregation into a plain map-side-combinable
    * `count` (each document contributes each digest at most once, so
    * count == countDistinct(doc_id)) — the countDistinct spelling's
    * expand + distinct shuffle was the pass's hotspot.
    */
  def lineDigests(s: UTF8String, nTok: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = WordsUtil.tokenize(s.toString)
    val n = toks.size
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < n) {
      val end = math.min(i + nTok, n)
      val lb = new java.lang.StringBuilder(toks.get(i))
      var j = i + 1
      while (j < end) { lb.append(' ').append(toks.get(j)); j += 1 }
      seen.add(md5Hex(md, lb.toString))
      i = end
    }
    val arr = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Per-position md5 hex digests of the [[tokenLines]] windows — the
    * occurrence side of first-occurrence line dedup (unlike
    * [[lineDigests]] this keeps EVERY occurrence: a line repeated
    * within one document must lose its later copies too).
    */
  def lineDigestSeq(s: UTF8String, nTok: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = WordsUtil.tokenize(s.toString)
    val n = toks.size
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = (n + nTok - 1) / nTok
    val arr = new Array[AnyRef](m)
    var li = 0
    var i = 0
    while (i < n) {
      val end = math.min(i + nTok, n)
      val lb = new java.lang.StringBuilder(toks.get(i))
      var j = i + 1
      while (j < end) { lb.append(' ').append(toks.get(j)); j += 1 }
      arr(li) = UTF8String.fromString(md5Hex(md, lb.toString))
      li += 1
      i = end
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** One-pass global first-occurrence line dedup against a broadcast
    * winner map (line digest -> packed (doc_id, pos) of the corpus-wide
    * FIRST occurrence, duplicated digests only): [[tokenLines]]
    * segmentation, keep a line iff its digest is absent (unique in the
    * corpus) or this occurrence IS the winner, rejoin survivors with
    * ' ' in order. Value parity with the join spelling is exact — same
    * tokenizer, same windows, same digest, same joiner — and dual-path
    * equality is spec'd (FilterOpsSpec).
    */
  def firstLineStrip(wm: WinnerMap, s: UTF8String, docId: Long, nTok: Int): InternalRow = {
    val toks = WordsUtil.tokenize(s.toString)
    val n = toks.size
    val md = java.security.MessageDigest.getInstance("MD5")
    var nLines = 0L
    var nDropped = 0L
    val out = new java.lang.StringBuilder
    var i = 0
    var pos = 0L
    while (i < n) {
      val end = math.min(i + nTok, n)
      val lb = new java.lang.StringBuilder(toks.get(i))
      var j = i + 1
      while (j < end) { lb.append(' ').append(toks.get(j)); j += 1 }
      val line = lb.toString
      nLines += 1
      val w = wm.m.get(md5Hex(md, line))
      if (w != null && (w(0) != docId || w(1) != pos)) nDropped += 1
      else {
        if (out.length() > 0) out.append(' ')
        out.append(line)
      }
      pos += 1
      i = end
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nLines, nDropped, UTF8String.fromString(out.toString)))
  }

  /** The derived line structure for the fixture corpus (newline-free
    * word soup): `nTok`-token lines joined by '\n', line i suffixed
    * with '' / '.' / '!' by (docId + i) % 3 — one tokenize + one build
    * pass instead of the transform/slice/concat lambda chain.
    */
  def suffixLines(s: UTF8String, docId: Long, nTok: Int): UTF8String = {
    // fail loudly on negative ids instead of silently diverging: the
    // builtin spelling (element_at(arr, (docId+i)%3 + 1)) errors or
    // nulls there, and the DuckDB oracle nulls — no engine has a
    // meaningful answer, so the precondition is named here
    require(docId >= 0, s"suffixLines requires doc_id >= 0, got $docId")
    val toks = WordsUtil.tokenize(s.toString)
    val n = toks.size
    val out = new java.lang.StringBuilder()
    var i = 0
    var line = 0L
    while (i < n) {
      if (i > 0) out.append('\n')
      val end = math.min(i + nTok, n)
      var j = i
      while (j < end) {
        if (j > i) out.append(' ')
        out.append(toks.get(j))
        j += 1
      }
      ((docId + line) % 3) match {
        case 1L => out.append('.')
        case 2L => out.append('!')
        case _ => ()
      }
      line += 1
      i = end
    }
    UTF8String.fromString(out.toString)
  }

  // ------------------------------------------------------------------
  // Arbitrary-length exact-substring dedup (the deduplicate-text-
  // datasets discipline at word-token granularity): per-position
  // k-token window digests, coverage = the union of duplicated
  // windows, rebuild = the uncovered tokens. The digest is a 64-bit
  // polynomial rolling hash over avalanche-mixed per-token hashes —
  // O(text) per document (a window-string md5 would be O(text · k))
  // and 8 bytes per window through the count exchange (4x lighter
  // than an md5 hex key). Cross-engine adjudication: the oracle
  // groups by the window STRING; the engine's 64-bit digest
  // partitions occurrences identically away from the ~2^-64-scale
  // collision case (the repeatedSpans md5-tiebreak rationale).
  // ------------------------------------------------------------------

  /** Odd multiplier for the rolling combine (golden-ratio constant). */
  private val SpanP = 0x9e3779b97f4a7c15L
  /** Murmur3 64-bit finalizer: avalanches the per-token FNV hash so the
    * polynomial combine sees high-entropy inputs in every bit.
    */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }
  private def tokenHash(t: String): Long = {
    var h = 0xcbf29ce484222325L // FNV-1a 64 over UTF-16 units
    var i = 0
    while (i < t.length) { h ^= t.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    fmix64(h)
  }
  private def windowHashes(toks: java.util.ArrayList[String], k: Int): Array[Long] = {
    val n = toks.size
    if (n < k) return Array.emptyLongArray
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = tokenHash(toks.get(i)); i += 1 }
    var pk = 1L // SpanP^(k-1): the retiring token's weight
    i = 1
    while (i < k) { pk *= SpanP; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * SpanP + hs(i); i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      h = (h - hs(i - k) * pk) * SpanP + hs(i)
      out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Per-position 64-bit digests of the k-token windows (every
    * occurrence; fewer than `k` tokens -> empty array). The occurrence
    * side of exact-substring dedup's duplicated-window count.
    */
  def shingleDigestSeq(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(windowHashes(WordsUtil.tokenize(s.toString), k))

  /** Shared rebuild core: walk the tokens once, extending the covered
    * horizon at every duplicated window START (token i covered iff some
    * duplicated window starting in [i-k+1, i] exists — the interval
    * union, which is what chains overlapping duplicated windows into
    * maximal runs), keep the uncovered tokens. `dupStart(i)` answers
    * "is the k-window starting at token i duplicated?" for
    * 0 <= i <= n-k. A document with zero removals keeps its ORIGINAL
    * text byte-for-byte (whitespace included); a rebuilt document
    * rejoins survivors with ' ' (the firstLineDedup rebuild rule).
    */
  private def stripCovered(
      original: UTF8String, toks: java.util.ArrayList[String], k: Int,
      dupStart: Int => Boolean): InternalRow = {
    val n = toks.size
    var covUntil = -1
    var removed = 0L
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (i <= n - k && dupStart(i)) {
        val e = i + k - 1
        if (e > covUntil) covUntil = e
      }
      if (i <= covUntil) removed += 1
      else {
        if (out.length() > 0) out.append(' ')
        out.append(toks.get(i))
      }
      i += 1
    }
    val cleaned =
      if (removed == 0) original else UTF8String.fromString(out.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, removed, cleaned))
  }

  /** One-pass exact-substring strip against a broadcast set of
    * duplicated window digests: tokenize, roll the window digests,
    * drop every token covered by a duplicated window, rejoin. Value
    * parity with the join spelling ([[dropCoveredSpans]] over joined
    * start positions) is exact — same tokenizer, same digests, same
    * coverage rule, same joiner — and dual-path equality is spec'd.
    */
  def substringStrip(set: LongSet, s: UTF8String, k: Int): InternalRow = {
    val toks = WordsUtil.tokenize(s.toString)
    val ws = windowHashes(toks, k)
    stripCovered(s, toks, k, i => set.contains(ws(i)))
  }

  /** The join-path rebuild: drop tokens covered by the EXPLICIT
    * duplicated-window start positions (ascending array<int>, as the
    * digest-join aggregation collects them).
    */
  def dropCoveredSpans(
      s: UTF8String, starts: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): InternalRow = {
    val toks = WordsUtil.tokenize(s.toString)
    val m = starts.numElements()
    var next = 0 // ascending cursor into starts: O(n + m), never a scan per token
    stripCovered(s, toks, k, { i =>
      while (next < m && starts.getInt(next) < i) next += 1
      next < m && starts.getInt(next) == i
    })
  }
}

/** Broadcast payload for [[SubstringStrip]]: the SORTED array of
  * duplicated k-window digests (binary-search membership — primitive
  * longs, no per-probe boxing).
  */
final class LongSet(val a: Array[Long]) extends Serializable {
  def contains(x: Long): Boolean = java.util.Arrays.binarySearch(a, x) >= 0
}

/** `graft_shingle_digest_seq(text)` -> array<bigint> of per-position
  * k-token window digests ([[FilterExprsUtil.shingleDigestSeq]]).
  */
case class ShingleDigestSeq(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2, s"window must be >= 2 tokens, got $k")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_digest_seq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FilterExprsUtil.shingleDigestSeq(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FilterExprsUtil.shingleDigestSeq($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleDigestSeq =
    copy(child = newChild)
}

/** `graft_substring_strip(text)` -> struct<n_tokens, n_removed,
  * cleaned>: the whole rebuild side of exact-substring dedup in ONE
  * codegen pass against a broadcast duplicated-digest set
  * ([[LongSet]]).
  */
case class SubstringStrip(child: Expression, bc: Broadcast[LongSet], k: Int)
    extends UnaryExpression {
  require(k >= 2, s"window must be >= 2 tokens, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))
  override def prettyName: String = "graft_substring_strip"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FilterExprsUtil.substringStrip(bc.value, input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("dupSetBc", bc, classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FilterExprsUtil.substringStrip(" +
        s"(graft.functions.LongSet) $bcRef.value(), $c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): SubstringStrip =
    copy(child = newChild)
}

/** `graft_drop_covered_spans(text, starts)` -> the same struct as
  * [[SubstringStrip]], from explicit ascending duplicated-window start
  * positions (the join path past the broadcast cap).
  */
case class DropCoveredSpans(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 2, s"window must be >= 2 tokens, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))
  override def prettyName: String = "graft_drop_covered_spans"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING text argument, got ${left.dataType.catalogString}")
    else if (!(right.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an ARRAY<INT> starts argument, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(text: Any, starts: Any): Any =
    FilterExprsUtil.dropCoveredSpans(
      text.asInstanceOf[UTF8String],
      starts.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, st) =>
      s"graft.functions.FilterExprsUtil.dropCoveredSpans($t, $st, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropCoveredSpans =
    copy(left = newLeft, right = newRight)
}

/** `graft_gopher_stats(text)` -> struct of the 9 Gopher rule counters. */
case class GopherStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("sum_wlen", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_dots", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ell", LongType, nullable = false)))

  override def prettyName: String = "graft_gopher_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FilterExprsUtil.gopherStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FilterExprsUtil.gopherStats($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

/** `graft_c4_stats(text, minWords)` -> struct<n_lines, n_kept, cleaned>. */
case class C4Stats(child: Expression, minWords: Int) extends UnaryExpression {
  require(minWords >= 1, s"minWords must be >= 1, got $minWords")

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))

  override def prettyName: String = "graft_c4_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FilterExprsUtil.c4Stats(input.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FilterExprsUtil.c4Stats($c, $minWords)")

  override protected def withNewChildInternal(newChild: Expression): C4Stats =
    copy(child = newChild)
}

/** `graft_boiler_strip(text)` -> struct<n_lines, n_boiler, cleaned>:
  * the whole rebuild side of corpus-frequency boilerplate stripping in
  * ONE codegen pass against a broadcast set of boiler-line md5 digests
  * (hex) — tokenize, window into `nTok`-token lines, drop lines whose
  * digest is in the set, rejoin the survivors in order. The literal
  * path replaces a corpus-scale line explode + flag join + per-line
  * text exchange + collect_list rebuild with a narrow projection; the
  * value contract is the join spelling's exactly (dual-path spec'd).
  */
case class BoilerStrip(child: Expression, bc: Broadcast[StrSet], nTok: Int)
    extends UnaryExpression {
  require(nTok >= 1, s"nTok must be >= 1, got $nTok")

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_boiler", LongType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))
  override def prettyName: String = "graft_boiler_strip"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FilterExprsUtil.boilerStrip(bc.value, input.asInstanceOf[UTF8String], nTok)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("boilerSetBc", bc, classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FilterExprsUtil.boilerStrip(" +
        s"(graft.functions.StrSet) $bcRef.value(), $c, $nTok)")
  }

  override protected def withNewChildInternal(newChild: Expression): BoilerStrip =
    copy(child = newChild)
}

/** `graft_line_digests(text, n_tok)` -> array of per-document DISTINCT
  * md5 hex digests of the token-line windows
  * ([[FilterExprsUtil.lineDigests]]).
  */
case class LineDigests(child: Expression, nTok: Int) extends UnaryExpression {
  require(nTok >= 1, s"nTok must be >= 1, got $nTok")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_line_digests"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FilterExprsUtil.lineDigests(input.asInstanceOf[UTF8String], nTok)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FilterExprsUtil.lineDigests($c, $nTok)")

  override protected def withNewChildInternal(newChild: Expression): LineDigests =
    copy(child = newChild)
}

/** `graft_token_lines(text, n_tok)` -> array of consecutive n-token
  * line windows ([[FilterExprsUtil.tokenLines]]).
  */
case class TokenLines(child: Expression, nTok: Int) extends UnaryExpression {
  require(nTok >= 1, s"nTok must be >= 1, got $nTok")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_lines"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FilterExprsUtil.tokenLines(input.asInstanceOf[UTF8String], nTok)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FilterExprsUtil.tokenLines($c, $nTok)")

  override protected def withNewChildInternal(newChild: Expression): TokenLines =
    copy(child = newChild)
}

/** `graft_suffix_lines(text, doc_id)` -> the derived line-structured
  * string ([[FilterExprsUtil.suffixLines]]), `nTok` tokens per line.
  */
case class SuffixLines(left: Expression, right: Expression, nTok: Int)
    extends BinaryExpression {
  require(nTok >= 1, s"nTok must be >= 1, got $nTok")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_suffix_lines"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING text argument, got ${left.dataType.catalogString}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT doc id argument, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(text: Any, docId: Any): Any =
    FilterExprsUtil.suffixLines(
      text.asInstanceOf[UTF8String], docId.asInstanceOf[Long], nTok)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) =>
      s"graft.functions.FilterExprsUtil.suffixLines($t, $d, $nTok)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SuffixLines =
    copy(left = newLeft, right = newRight)
}

/** Broadcast payload for [[FirstLineStrip]]: line digest hex -> the
  * corpus-wide first occurrence as `Array(doc_id, pos)` (duplicated
  * digests only — unique lines stay out of the map and keep by
  * absence).
  */
final class WinnerMap(val m: java.util.HashMap[String, Array[Long]])
    extends Serializable

/** `graft_line_digest_seq(text, n_tok)` -> array of per-position md5
  * hex digests of the token-line windows (every occurrence, unlike
  * [[LineDigests]]' per-document distinct set).
  */
case class LineDigestSeq(child: Expression, nTok: Int) extends UnaryExpression {
  require(nTok >= 1, s"nTok must be >= 1, got $nTok")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_line_digest_seq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    FilterExprsUtil.lineDigestSeq(input.asInstanceOf[UTF8String], nTok)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FilterExprsUtil.lineDigestSeq($c, $nTok)")

  override protected def withNewChildInternal(newChild: Expression): LineDigestSeq =
    copy(child = newChild)
}

/** `graft_first_line_strip(text, doc_id)` ->
  * struct<n_lines, n_dropped, cleaned>: the whole rebuild side of
  * global first-occurrence line dedup in ONE codegen pass against a
  * broadcast winner map ([[WinnerMap]]) — tokenize, window into
  * `nTok`-token lines, drop every occurrence of a duplicated line
  * except the corpus-wide first, rejoin survivors in order. The
  * literal path replaces a corpus-scale line explode + winner join +
  * per-line text exchange + collect_list rebuild with a narrow
  * projection; the value contract is the join spelling's exactly
  * (dual-path spec'd).
  */
case class FirstLineStrip(
    left: Expression, right: Expression, bc: Broadcast[WinnerMap], nTok: Int)
    extends BinaryExpression {
  require(nTok >= 1, s"nTok must be >= 1, got $nTok")

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_dropped", LongType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))
  override def prettyName: String = "graft_first_line_strip"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING text argument, got ${left.dataType.catalogString}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT doc id argument, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(text: Any, docId: Any): Any =
    FilterExprsUtil.firstLineStrip(
      bc.value, text.asInstanceOf[UTF8String], docId.asInstanceOf[Long], nTok)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("winnerMapBc", bc, classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, (t, d) =>
      s"graft.functions.FilterExprsUtil.firstLineStrip(" +
        s"(graft.functions.WinnerMap) $bcRef.value(), $t, $d, $nTok)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstLineStrip =
    copy(left = newLeft, right = newRight)
}
