package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction: the step between an HTTP-decoded crawl body
  * and every text operator in the engine (tokenize/Gopher/C4/dedup all
  * assume TEXT — `word_count` of raw markup is mostly tag tokens).
  *
  * The semantics are a FIXED, cross-engine-spellable rule chain (each
  * step is a regex/replace pass both Spark SQL and DuckDB can spell
  * identically; the DuckDB oracle of `q_html_extract` runs exactly this
  * chain, and HtmlExtractSpec pins this fused implementation against
  * the builtin `regexp_replace` spelling):
  *
  *  1. strip comments: `(?s)<!--.*?-->` → '' (lazy, global; an
  *     unterminated comment stays — the regex would not match it);
  *  2. strip whole elements `script`, `style`, `head`, `noscript`,
  *     `svg`, `template`, `iframe` (in that order):
  *     `(?is)<tag([ \t\r\n\f][^>]*)?>.*?</tag[ \t\r\n\f]*>` → '';
  *  3. collapse every `[ \t\r\n\f]+` run to one space (source
  *     newlines are rendering whitespace, NOT line structure);
  *  4. block-level tags → '\n': `(?i)</?(p|div|…)([ \t\r\n\f][^>]*)?` +
  *     `/?[ \t\r\n\f]*>` — open, close, and self-closing forms — so
  *     block structure becomes LINE structure and the line-based
  *     C4/Gopher/boilerplate batteries compose downstream;
  *  5. split on '\n'; per line: drop remaining (inline) tags
  *     `<[^>]*>` → '', decode entities (named set, sequential literal
  *     replaces — `&lt; &gt; &quot; &#39; &apos; &nbsp;`, then `&amp;`
  *     LAST so double-escapes decode one level, per the HTML spec),
  *     collapse space runs, trim; drop empty lines.
  *
  * Main-content extraction (stage 2, the link-density heuristic every
  * crawl pipeline applies before quality filtering): per line, the
  * characters inside `<a …>…</a>` spans — measured on the SAME cleaned
  * scale as the line — give `n_link_chars`; a line is boilerplate when
  * link text is more than half its text (`2·n_link > n_chars`:
  * navigation, footers, "related links" rows), content otherwise.
  * Integer arithmetic only, so the keep decision is engine-exact.
  *
  * Implementation: hand-rolled linear scans (each pass is `indexOf`/
  * `charAt` over the document — measured much cheaper than running 6
  * regex engines per document) that reproduce the regex chain's
  * semantics EXACTLY, including the engine's advance-by-one-character
  * behavior on a failed match and first-'>'-terminates-a-tag. ASCII
  * case folding only (java.util.regex `(?i)` semantics without
  * UNICODE_CASE — tag names are ASCII).
  */
object HtmlTextUtil {

  /** Block-level tag set — declaration order is the SQL alternation
    * order (semantically order-independent: a proper-prefix alternative
    * always fails the remainder check exactly when the full name
    * does not match).
    */
  val BlockTagSeq: Seq[String] = Seq(
    "html", "body", "p", "div", "br", "hr",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
    "blockquote", "pre", "section", "article", "header", "footer",
    "nav", "aside", "main", "figure", "figcaption", "form", "fieldset",
    "address", "center")
  val BlockTags: Set[String] = BlockTagSeq.toSet

  /** The regex alternation for the SQL spellings of step 4. */
  def blockAlt: String = BlockTagSeq.mkString("|")

  /** Entity decode table in its REQUIRED order (`&amp;` last). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f'
  @inline private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** ASCII-only case-insensitive `regionMatches` (java-regex `(?i)`
    * folding; `String.regionMatches(true, …)` would also fold
    * non-ASCII pairs like ſ/s, which `(?i)` without UNICODE_CASE
    * does not).
    */
  private def matchesCi(s: String, at: Int, target: String): Boolean = {
    if (at + target.length > s.length) return false
    var i = 0
    while (i < target.length) {
      val a = s.charAt(at + i)
      val b = target.charAt(i)
      val af = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
      val bf = if (b >= 'A' && b <= 'Z') (b + 32).toChar else b
      if (af != bf) return false
      i += 1
    }
    true
  }

  private def indexOfCi(s: String, target: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = s.length - target.length
    while (i <= last) {
      if (matchesCi(s, i, target)) return i
      i += 1
    }
    -1
  }

  /** Step 1: `(?s)<!--.*?-->` → '' (global). */
  def stripComments(s: String): String = {
    if (s.indexOf("<!--") < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val open = s.indexOf("<!--", i)
      if (open < 0) { sb.append(s, i, s.length); i = s.length }
      else {
        sb.append(s, i, open)
        val close = s.indexOf("-->", open + 4)
        if (close < 0) { sb.append(s, open, s.length); i = s.length }
        else i = close + 3
      }
    }
    sb.toString
  }

  /** Step 2: `(?is)<tag([ \t\r\n\f][^>]*)?>.*?</tag[ \t\r\n\f]*>` → ''
    * (global). A failed match (bad open form, or no valid close tag)
    * leaves this position's character and re-tries from the next — the
    * regex engine's behavior.
    */
  def stripElement(s: String, tag: String): String = {
    val open = "<" + tag
    val close = "</" + tag
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val o = indexOfCi(s, open, i)
      if (o < 0) { sb.append(s, i, s.length); i = s.length }
      else {
        sb.append(s, i, o)
        var contentStart = -1
        val k = o + open.length
        if (k < s.length) {
          if (s.charAt(k) == '>') contentStart = k + 1
          else if (isWs(s.charAt(k))) {
            val gt = s.indexOf('>', k)
            if (gt >= 0) contentStart = gt + 1
          }
        }
        var closeEnd = -1
        if (contentStart >= 0) {
          var c = contentStart
          var searching = true
          while (searching) {
            val cc = indexOfCi(s, close, c)
            if (cc < 0) searching = false
            else {
              var m = cc + close.length
              while (m < s.length && isWs(s.charAt(m))) m += 1
              if (m < s.length && s.charAt(m) == '>') {
                closeEnd = m + 1; searching = false
              } else c = cc + 1
            }
          }
        }
        if (closeEnd < 0) { sb.append(s.charAt(o)); i = o + 1 }
        else i = closeEnd
      }
    }
    sb.toString
  }

  /** Step 3: `[ \t\r\n\f]+` → ' ' (global). */
  def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) {
        sb.append(' ')
        i += 1
        while (i < s.length && isWs(s.charAt(i))) i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Step 4: block-level tags → '\n' (global; open/close/self-closing).
    * After the tag name, the remainder up to the FIRST '>' must match
    * `([ \t\r\n\f][^>]*)?/?[ \t\r\n\f]*` — i.e. empty, whitespace-led
    * (then anything), or '/' followed by only whitespace.
    */
  def blockToNewline(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '<') { sb.append(c); i += 1 }
      else {
        var k = i + 1
        if (k < s.length && s.charAt(k) == '/') k += 1
        val ns = k
        while (k < s.length && isAsciiAlnum(s.charAt(k))) k += 1
        val name =
          if (k > ns) s.substring(ns, k).toLowerCase(Locale.ROOT) else ""
        var matched = false
        if (name.nonEmpty && BlockTags.contains(name)) {
          val gt = s.indexOf('>', k)
          if (gt >= 0) {
            val ok =
              if (gt == k) true
              else if (isWs(s.charAt(k))) true
              else if (s.charAt(k) == '/') {
                var m = k + 1
                while (m < gt && isWs(s.charAt(m))) m += 1
                m == gt
              } else false
            if (ok) { sb.append('\n'); i = gt + 1; matched = true }
          }
        }
        if (!matched) { sb.append(c); i += 1 }
      }
    }
    sb.toString
  }

  /** Per-line `<[^>]*>` → '' (a '<' with no '>' after it is literal
    * text).
    */
  def removeTags(s: String): String = {
    if (s.indexOf('<') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '<') { sb.append(c); i += 1 }
      else {
        val gt = s.indexOf('>', i + 1)
        if (gt < 0) { sb.append(s, i, s.length); i = s.length }
        else i = gt + 1
      }
    }
    sb.toString
  }

  /** Sequential literal entity replaces, `&amp;` last. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    var r = s
    Entities.foreach { case (e, v) => r = r.replace(e, v) }
    r
  }

  /** Collapse ' '+ runs, then trim SPACES only (DuckDB `trim`
    * semantics; after step 3 and entity decode the only whitespace
    * left is the space character).
    */
  def collapseTrimSpaces(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') {
        sb.append(' ')
        i += 1
        while (i < s.length && s.charAt(i) == ' ') i += 1
      } else { sb.append(c); i += 1 }
    }
    var a = 0
    var b = sb.length
    if (b > 0 && sb.charAt(0) == ' ') a = 1
    if (b > a && sb.charAt(b - 1) == ' ') b -= 1
    sb.substring(a, b)
  }

  /** The per-line text cleanup shared by line text and link text. */
  def clean(raw: String): String =
    collapseTrimSpaces(decodeEntities(removeTags(raw)))

  /** Σ length(clean(inner)) over `(?is)<a([ \t\r\n\f][^>]*)?>(.*?)` +
    * `</a[ \t\r\n\f]*>` matches of the RAW line (global, lazy;
    * anchors do not cross block boundaries by construction — step 4
    * already split on block tags).
    */
  def linkChars(raw: String): Int = {
    var total = 0
    var i = 0
    while (i < raw.length) {
      val o = indexOfCi(raw, "<a", i)
      if (o < 0) i = raw.length
      else {
        var contentStart = -1
        val k = o + 2
        if (k < raw.length) {
          if (raw.charAt(k) == '>') contentStart = k + 1
          else if (isWs(raw.charAt(k))) {
            val gt = raw.indexOf('>', k)
            if (gt >= 0) contentStart = gt + 1
          }
        }
        var closeEnd = -1
        var inner: String = null
        if (contentStart >= 0) {
          var c = contentStart
          var searching = true
          while (searching) {
            val cc = indexOfCi(raw, "</a", c)
            if (cc < 0) searching = false
            else {
              var m = cc + 3
              while (m < raw.length && isWs(raw.charAt(m))) m += 1
              if (m < raw.length && raw.charAt(m) == '>') {
                inner = raw.substring(contentStart, cc)
                closeEnd = m + 1
                searching = false
              } else c = cc + 1
            }
          }
        }
        if (closeEnd < 0) i = o + 1
        else { total += codePoints(clean(inner)); i = closeEnd }
      }
    }
    total
  }

  /** Unicode code points, not UTF-16 code units — DuckDB's length()
    * and Spark's length()/UTF8String.numChars both count code points,
    * so supplementary-plane chars (emoji, common in crawl text) must
    * count as 1 here too or the keep gate diverges from the oracle.
    */
  @inline def codePoints(s: String): Int = s.codePointCount(0, s.length)

  /** One extracted line: cleaned text + code-point/link-char counts. */
  final case class Line(text: String, nChars: Int, nLink: Int)

  /** Elements stripped WHOLE (content included), in chain order —
    * script/style/head carry no rendered text; noscript/svg/template/
    * iframe carry fallback/vector/inert markup a text pipeline must
    * never tokenize (r13 verdict directive: strip them like
    * script/style).
    */
  val StrippedElements: Seq[String] =
    Seq("script", "style", "head", "noscript", "svg", "template", "iframe")

  /** The full chain: nonempty cleaned lines with link stats. */
  def lines(html: String): Array[Line] = {
    val noC = stripComments(html)
    val noE = StrippedElements.foldLeft(noC)(stripElement)
    val flat = blockToNewline(collapseWs(noE))
    val raw = flat.split("\n", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Line](raw.length)
    raw.foreach { r =>
      val t = clean(r)
      if (t.nonEmpty) out += Line(t, codePoints(t), linkChars(r))
    }
    out.toArray
  }

  @inline def isContent(l: Line): Boolean = 2L * l.nLink <= l.nChars

  /** (text, main_text, n_lines, n_kept) for [[HtmlExtract]]. */
  def extract(html: String): GenericInternalRow = {
    val ls = lines(html)
    val all = new java.lang.StringBuilder
    val main = new java.lang.StringBuilder
    var kept = 0
    ls.foreach { l =>
      if (all.length > 0) all.append('\n')
      all.append(l.text)
      if (isContent(l)) {
        if (main.length > 0) main.append('\n')
        main.append(l.text)
        kept += 1
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(all.toString),
      UTF8String.fromString(main.toString),
      ls.length, kept))
  }

  /** array<struct<line, n_chars, n_link_chars>> for [[HtmlLineStats]]. */
  def lineStatsArray(html: String): GenericArrayData = {
    val ls = lines(html)
    new GenericArrayData(ls.map(l => new GenericInternalRow(Array[Any](
      UTF8String.fromString(l.text), l.nChars, l.nLink)): AnyRef))
  }

  /** array<struct<nc, nw, ns, nl>> for [[HtmlBlockStats]]: per-line
    * code-point chars, words (Go-Fields tokenize — the line is
    * space-collapsed, so this equals a single-space split), members of
    * `stops`, link chars — the block-gate evidence in ONE scan (the
    * lambda spelling `transform(html_lines(x), …tokenize…)` ran
    * interpreted per line and measured ~3x the whole chain).
    */
  def blockStatsArray(html: String, stops: java.util.HashSet[String])
      : GenericArrayData = {
    val ls = lines(html)
    new GenericArrayData(ls.map { l =>
      val toks = WordsUtil.tokenize(l.text)
      var ns = 0
      var i = 0
      while (i < toks.size) {
        if (stops.contains(toks.get(i))) ns += 1
        i += 1
      }
      new GenericInternalRow(Array[Any](l.nChars, toks.size, ns, l.nLink)): AnyRef
    })
  }
}

/** `graft_html_extract(html)` -> struct<text, main_text, n_lines,
  * n_kept>: stage-1 extracted text (all lines) and stage-2 main
  * content (link-density-gated lines), in one parse.
  */
case class HtmlExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("main_text", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false)))
  override def prettyName: String = "graft_html_extract"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlTextUtil.extract(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlTextUtil.extract($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

/** `graft_html_lines(html)` -> array<struct<line, n_chars,
  * n_link_chars>>: the per-line link-density evidence behind the
  * main-content gate (inspectable form of [[HtmlExtract]]'s stage 2).
  */
case class HtmlLineStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("line", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_link_chars", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_lines"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlTextUtil.lineStatsArray(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlTextUtil.lineStatsArray($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): HtmlLineStats =
    copy(child = newChild)
}

/** `graft_html_blocks(html)` -> array<struct<nc, nw, ns, nl>>: the
  * per-line block-gate evidence (code-point chars, words, stopwords,
  * link chars) in one fused scan — the metrics behind the
  * justext-shape block classification (q_html_blocks).
  */
case class HtmlBlockStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nc", IntegerType, nullable = false),
    StructField("nw", IntegerType, nullable = false),
    StructField("ns", IntegerType, nullable = false),
    StructField("nl", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_blocks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlTextUtil.blockStatsArray(input.asInstanceOf[UTF8String].toString, stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: Janino compiles no generics — a parameterized cast here
    // would fail stage codegen and silently run the whole stage
    // interpreted
    val ref = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlTextUtil.blockStatsArray($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlBlockStats =
    copy(child = newChild)
}
