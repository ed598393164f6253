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
