package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** HTTP/1.x message parsing for WARC `response` records (ISO 28500
  * §6.3: the record payload of a response record with Content-Type
  * `application/http;msgtype=response` is the captured HTTP message —
  * status line, header block, body). This is what real crawls ship:
  * every Common Crawl shard is response records, so reading actual
  * crawl data means parsing this wire shape, not just the record
  * framing.
  *
  * Scope is the READ side of a crawl pipeline:
  *  - status line -> integer status code;
  *  - header block (obs-fold tolerated, first occurrence wins for
  *    lookups, exactly the stance of the WARC header parser);
  *  - `Transfer-Encoding: chunked` de-chunking (captures recorded
  *    before the crawler normalized the framing);
  *  - `Content-Encoding: gzip | deflate (zlib or raw) | br (decoder
  *    resolved reflectively; env-gated) | identity` (anything else is
  *    an error-channel case, never a throw);
  *  - charset by WHATWG precedence: BOM (utf-8/utf-16be/utf-16le,
  *    stripped from the text), then the Content-Type `charset=`
  *    parameter, then (HTML only) the body's own `<meta charset>`
  *    prescan, UTF-8
  *    fallback when absent; a STRICT decode so mojibake lands in the
  *    row-level error channel instead of silently corrupting the
  *    corpus (a quality gate downstream cannot un-mix a mis-decoded
  *    document).
  *
  * Everything returns Either — malformed wire bytes are data, not
  * exceptions, per the engine's row-level error-channel discipline
  * (the reference's per-row error column, /root/reference/main.go:73-80).
  */
object HttpWire {

  /** One parsed HTTP response message. `headers` preserves the raw
    * header block (first occurrence wins); `body` is the message body
    * AS CAPTURED — transfer/content decoding happens in
    * [[decodeTextBody]], so a caller that only needs the status line
    * (a status-code histogram over a crawl) never pays gunzip or
    * de-chunking, and a column's value can never depend on whether the
    * body was asked for.
    */
  final case class Response(status: Int, headers: Map[String, String], body: Array[Byte]) {
    def header(k: String): Option[String] =
      headers.collectFirst { case (hk, v) if hk.equalsIgnoreCase(k) => v }

    /** Lowercased media type from Content-Type, parameters stripped
      * (`"Text/HTML; charset=utf-8"` -> `"text/html"`); null if absent.
      */
    def mime: String = mimeOf(header("Content-Type").orNull)

    /** Charset parameter of Content-Type (unquoted, as written), or
      * null when absent.
      */
    def charsetName: String = header("Content-Type") match {
      case Some(ct) =>
        CharsetParam.findFirstMatchIn(ct)
          .map(m => Option(m.group(1)).getOrElse(m.group(2)).trim)
          .filter(_.nonEmpty).orNull
      case None => null
    }
  }

  private val CharsetParam =
    """(?i)charset\s*=\s*(?:"([^"]*)"|([^;\s"]+))""".r

  /** Lowercased media type of any Content-Type value, parameters
    * stripped; null for null/blank input.
    */
  def mimeOf(contentType: String): String =
    if (contentType == null) null
    else {
      val semi = contentType.indexOf(';')
      val m = (if (semi < 0) contentType else contentType.substring(0, semi)).trim.toLowerCase
      if (m.isEmpty) null else m
    }

  /** Parse a captured HTTP response message's PRELUDE: status line and
    * header block. Left(reason) on a malformed prelude (truncated
    * header block, non-numeric status). Body bytes are returned raw —
    * transfer/content decoding is [[decodeTextBody]]'s job, so body
    * problems (bad chunk framing, corrupt gzip, unknown encodings) are
    * body-decode errors, not prelude errors, and `status`/`mime` stay
    * well-defined for every well-framed message. Never throws.
    */
  def parseResponse(payload: Array[Byte]): Either[String, Response] = {
    val headerEnd = findHeaderEnd(payload)
    if (headerEnd < 0) return Left("http: no header/body delimiter in payload")
    // the prelude is ASCII-compatible by spec; latin-1 maps every byte.
    // headerEnd points at the LF closing the LAST header line — drop a
    // CR before it so the final line doesn't keep a trailing '\r'.
    val preludeEnd = if (headerEnd > 0 && payload(headerEnd - 1) == '\r') headerEnd - 1 else headerEnd
    val prelude = new String(payload, 0, preludeEnd, ISO_8859_1)
    val lines = prelude.split("\r?\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("HTTP/"))
      return Left(s"http: expected status line, got '${lines.headOption.getOrElse("")}'")
    val statusTok = lines(0).split(" ", 3)
    if (statusTok.length < 2) return Left(s"http: malformed status line '${lines(0)}'")
    val status =
      try statusTok(1).trim.toInt
      catch { case _: NumberFormatException =>
        return Left(s"http: non-numeric status '${statusTok(1)}'") }
    // header block with obs-fold continuation (SP/HT-led lines)
    val headers = scala.collection.mutable.LinkedHashMap[String, String]()
    var lastKey: String = null
    var i = 1
    while (i < lines.length) {
      val h = lines(i)
      if (h.nonEmpty) {
        if ((h.charAt(0) == ' ' || h.charAt(0) == '\t') && lastKey != null) {
          headers(lastKey) = headers(lastKey) + " " + h.trim
        } else {
          val c = h.indexOf(':')
          if (c < 0) return Left(s"http: malformed header line '$h'")
          lastKey = h.substring(0, c).trim
          // first occurrence wins (duplicate Set-Cookie etc. are lookup
          // noise; the engine's columns read single-valued headers)
          if (!headers.contains(lastKey)) headers(lastKey) = h.substring(c + 1).trim
        }
      }
      i += 1
    }
    Right(Response(status, headers.toMap,
      java.util.Arrays.copyOfRange(payload, bodyStart(payload, headerEnd), payload.length)))
  }

  /** Decode a response's body to text — the ONLY place body bytes are
    * touched: transfer decoding (chunked), then content decoding
    * (gzip/deflate/identity), then a strict charset decode under the
    * message's own Content-Type charset.
    *  - Right(Some(text)): `text/`-class body decoded under the declared
    *    charset (UTF-8 when undeclared);
    *  - Right(None): not a `text/`-class media type — the record is fine,
    *    it just isn't text (the caller's text column stays null; the
    *    body is never decoded at all);
    *  - Left(reason): chunked framing that doesn't parse, corrupt or
    *    unsupported transfer/content encoding, unknown declared charset,
    *    or bytes invalid under it (strict decode) — the error channel.
    */
  def decodeTextBody(r: Response): Either[String, Option[String]] = {
    val m = r.mime
    if (m == null || !m.startsWith("text/")) return Right(None)
    // 1. transfer decoding: chunked framing off the wire bytes
    val transferDecoded: Either[String, Array[Byte]] =
      r.header("Transfer-Encoding").map(_.trim.toLowerCase) match {
        case Some(te) if te.endsWith("chunked") => dechunk(r.body)
        case Some("identity") | None            => Right(r.body)
        case Some(te)                           => Left(s"http: unsupported transfer-encoding '$te'")
      }
    // 2. content decoding: compression the server applied to the entity
    val decoded: Either[String, Array[Byte]] = transferDecoded.flatMap { wire =>
      r.header("Content-Encoding").map(_.trim.toLowerCase) match {
        case Some("gzip") | Some("x-gzip") => inflate(wire, gzip = true)
        case Some("deflate")               => inflateDeflate(wire)
        case Some("br")                    => brotli(wire)
        case Some("identity") | None       => Right(wire)
        case Some(ce)                      => Left(s"http: unsupported content-encoding '$ce'")
      }
    }
    // 3. character decoding, WHATWG precedence: a BYTE ORDER MARK
    // outranks everything (browsers decode a BOM'd page by its BOM even
    // against a contradicting header — the serializer that wrote the
    // BOM knew the encoding), then the Content-Type charset parameter,
    // then (HTML only) the body's own <meta charset=…> declaration
    // (scanned over the first 1024 decoded-entity bytes, the WHATWG
    // prescan budget), then the UTF-8 fallback. The BOM itself is
    // STRIPPED from the decoded text (it is encoding metadata; a
    // leading U+FEFF would poison the first token of every downstream
    // tokenizer pass). Only the three WHATWG-sniffed BOMs participate
    // (utf-8 / utf-16be / utf-16le); utf-32 is not sniffed, matching
    // the spec.
    decoded.flatMap { entity =>
      val (cs: Either[String, Charset], skip: Int) = bomCharset(entity) match {
        case Some((bomCs, bomLen)) => (Right(bomCs), bomLen)
        case None =>
          val headerCs = r.charsetName
          val csName =
            if (headerCs != null) headerCs
            else if (m == "text/html") metaCharset(entity)
            else null
          val resolved: Either[String, Charset] =
            if (csName == null) Right(UTF_8)
            else
              try Right(Charset.forName(csName))
              catch { case _: Exception => Left(s"http: unsupported charset '$csName'") }
          (resolved, 0)
      }
      cs.flatMap { charset =>
        try {
          val dec = charset.newDecoder()
            .onMalformedInput(CodingErrorAction.REPORT)
            .onUnmappableCharacter(CodingErrorAction.REPORT)
          Right(Some(dec.decode(java.nio.ByteBuffer.wrap(
            entity, skip, entity.length - skip)).toString))
        } catch {
          case _: java.nio.charset.CharacterCodingException =>
            Left(s"http: body is not valid ${charset.name}")
        }
      }
    }
  }

  /** The WHATWG BOM sniff: (charset, BOM length) for the three
    * sniffed marks, None otherwise. Checked on the raw entity bytes
    * BEFORE any charset resolution.
    */
  private[sources] def bomCharset(entity: Array[Byte])
      : Option[(Charset, Int)] = {
    if (entity.length >= 3 &&
      entity(0) == 0xEF.toByte && entity(1) == 0xBB.toByte &&
      entity(2) == 0xBF.toByte) Some((UTF_8, 3))
    else if (entity.length >= 2 &&
      entity(0) == 0xFE.toByte && entity(1) == 0xFF.toByte)
      Some((java.nio.charset.StandardCharsets.UTF_16BE, 2))
    else if (entity.length >= 2 &&
      entity(0) == 0xFF.toByte && entity(1) == 0xFE.toByte)
      Some((java.nio.charset.StandardCharsets.UTF_16LE, 2))
    else None
  }

  /** Charset declared in the markup itself: `<meta charset=X>` or
    * `<meta http-equiv="Content-Type" content="…; charset=X">`,
    * scanned over the first 1024 bytes (the WHATWG encoding-sniff
    * prescan budget — declarations past that are required by spec to
    * be within it). The prescan bytes are read as latin-1, which maps
    * every byte and is ASCII-compatible — exactly the property the
    * prescan needs, since the declaration itself is ASCII. Returns the
    * declared name as written, or null.
    */
  private[sources] def metaCharset(entity: Array[Byte]): String = {
    val n = math.min(entity.length, 1024)
    if (n == 0) return null
    val head = new String(entity, 0, n, ISO_8859_1)
    var i = 0
    while (i < head.length) {
      val o = indexOfMetaTag(head, i)
      if (o < 0) return null
      val gt = head.indexOf('>', o)
      val end = if (gt < 0) head.length else gt
      val cs = charsetFromMetaAttrs(head, o + 5, end)
      if (cs != null) return normalizeSniffedLabel(cs)
      i = end + 1
    }
    null
  }

  /** WHATWG prescan label fixups: a meta-declared utf-16 family label
    * means the document was NOT actually utf-16 at this point (a real
    * utf-16 page can't have an ASCII-readable prescan), so the spec
    * says decode as UTF-8; x-user-defined maps to windows-1252.
    */
  private def normalizeSniffedLabel(label: String): String = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (l == "utf-16" || l == "utf-16be" || l == "utf-16le") "UTF-8"
    else if (l == "x-user-defined") "windows-1252"
    else label.trim
  }

  /** Next `<meta` tag-open at or after `from` — the 5 chars
    * case-insensitively, followed by whitespace or `/` (the WHATWG
    * prescan's tag-name boundary), so `<metadata>` never matches.
    */
  private def indexOfMetaTag(s: String, from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 5 < s.length) {
      if (s.charAt(i) == '<' && s.regionMatches(true, i + 1, "meta", 0, 4)) {
        val c = s.charAt(i + 5)
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == '/')
          return i
      }
      i += 1
    }
    -1
  }

  /** The WHATWG prescan's per-meta attribute walk over `[from, end)`
    * (end = the tag's first `>`). ONLY an actual `charset` ATTRIBUTE of
    * the tag counts — `charset=` inside another attribute's value (a
    * name/content pair, say) is invisible here, unlike a regex over the
    * raw tag text. The pragma path needs BOTH http-equiv=content-type
    * and a content attribute carrying a charset parameter.
    */
  private def charsetFromMetaAttrs(s: String, from: Int, end: Int): String = {
    @inline def ws(c: Char) =
      c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f'
    var i = from
    var charsetVal: String = null
    var contentVal: String = null
    var gotPragma = false
    while (i < end) {
      while (i < end && (ws(s.charAt(i)) || s.charAt(i) == '/')) i += 1
      if (i < end) {
        val ns = i
        while (i < end && s.charAt(i) != '=' && !ws(s.charAt(i)) &&
          s.charAt(i) != '/') i += 1
        val name = s.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
        while (i < end && ws(s.charAt(i))) i += 1
        var value: String = null
        if (i < end && s.charAt(i) == '=') {
          i += 1
          while (i < end && ws(s.charAt(i))) i += 1
          if (i < end) {
            val q = s.charAt(i)
            if (q == '"' || q == '\'') {
              val close = s.indexOf(q, i + 1)
              if (close >= 0 && close < end) {
                value = s.substring(i + 1, close); i = close + 1
              } else { value = s.substring(i + 1, end); i = end }
            } else {
              val vs = i
              while (i < end && !ws(s.charAt(i))) i += 1
              value = s.substring(vs, i)
            }
          } else value = ""
        }
        if (name.nonEmpty) name match {
          case "charset" if charsetVal == null =>
            charsetVal = if (value == null) "" else value.trim
          case "content" if contentVal == null => contentVal = value
          case "http-equiv" if value != null &&
            value.trim.equalsIgnoreCase("content-type") => gotPragma = true
          case _ =>
        }
      }
    }
    if (charsetVal != null && charsetVal.nonEmpty) charsetVal
    else if (gotPragma && contentVal != null)
      CharsetParam.findFirstMatchIn(contentVal)
        .map(c => Option(c.group(1)).getOrElse(c.group(2)).trim)
        .filter(_.nonEmpty).orNull
    else null
  }

  // -------------------------------------------------------------------
  // wire helpers
  // -------------------------------------------------------------------

  /** Index of the first byte of the blank line ending the header block
    * (CRLFCRLF per spec, bare LFLF tolerated); -1 if absent.
    */
  private def findHeaderEnd(b: Array[Byte]): Int = {
    var i = 0
    while (i < b.length) {
      if (b(i) == '\n') {
        if (i + 2 <= b.length - 1 && b(i + 1) == '\r' && b(i + 2) == '\n') return i
        if (i + 1 <= b.length - 1 && b(i + 1) == '\n') return i
        if (i + 1 == b.length) return i // header block ends the payload (no body)
      }
      i += 1
    }
    -1
  }

  private def bodyStart(b: Array[Byte], headerEnd: Int): Int = {
    // headerEnd points at the LF closing the last header line; skip the
    // blank line that follows
    var i = headerEnd + 1
    if (i < b.length && b(i) == '\r') i += 1
    if (i < b.length && b(i) == '\n') i += 1
    math.min(i, b.length)
  }

  /** Decode `Transfer-Encoding: chunked` framing: hex size line
    * (extensions after ';' ignored), that many bytes, CRLF, repeated;
    * a 0-size chunk then optional trailers end the body.
    */
  private def dechunk(wire: Array[Byte]): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(wire.length)
    var i = 0
    def readLine(): String = {
      val start = i
      while (i < wire.length && wire(i) != '\n') i += 1
      if (i >= wire.length) return null
      val end = if (i > start && wire(i - 1) == '\r') i - 1 else i
      i += 1 // past LF
      new String(wire, start, end - start, ISO_8859_1)
    }
    while (true) {
      val sizeLine = readLine()
      if (sizeLine == null) return Left("http: chunked body truncated at size line")
      val semi = sizeLine.indexOf(';')
      val hexStr = (if (semi < 0) sizeLine else sizeLine.substring(0, semi)).trim
      val size =
        try java.lang.Long.parseLong(hexStr, 16)
        catch { case _: NumberFormatException =>
          return Left(s"http: bad chunk size '$hexStr'") }
      if (size == 0) return Right(out.toByteArray) // trailers (if any) carry no body
      // Long.parseLong(_, 16) accepts a leading '-'; a negative size
      // would slip past the overrun guard and make out.write throw —
      // hostile/corrupt captures must stay in the error channel.
      if (size < 0) return Left(s"http: bad chunk size '$hexStr'")
      if (size > Int.MaxValue - 8L || i + size > wire.length)
        return Left(s"http: chunk of $size bytes overruns the captured body")
      out.write(wire, i, size.toInt)
      i += size.toInt
      // chunk data is followed by CRLF
      if (i < wire.length && wire(i) == '\r') i += 1
      if (i < wire.length && wire(i) == '\n') i += 1
    }
    Right(out.toByteArray) // unreachable
  }

  private def inflate(wire: Array[Byte], gzip: Boolean): Either[String, Array[Byte]] =
    try {
      val in =
        if (gzip) new java.util.zip.GZIPInputStream(new ByteArrayInputStream(wire), 1 << 14)
        else new java.util.zip.InflaterInputStream(new ByteArrayInputStream(wire))
      Right(drain(in, wire.length * 2 + 64))
    } catch {
      case e: java.io.IOException =>
        Left(s"http: content-encoding decode failed: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
    }

  /** `Content-Encoding: deflate` per RFC 9110 is zlib-wrapped, but a
    * long tail of real servers (and therefore real crawl captures)
    * send RAW deflate — browsers and WARC toolkits all fall back, so
    * so do we: try zlib first, and on failure retry with a nowrap
    * Inflater before giving up to the error channel.
    */
  private def inflateDeflate(wire: Array[Byte]): Either[String, Array[Byte]] =
    inflate(wire, gzip = false) match {
      case r @ Right(_) => r
      case Left(zlibErr) =>
        try {
          val in = new java.util.zip.InflaterInputStream(
            new ByteArrayInputStream(wire), new java.util.zip.Inflater(true))
          Right(drain(in, wire.length * 2 + 64))
        } catch {
          case _: java.io.IOException => Left(zlibErr) // report the primary failure
        }
    }

  /** `Content-Encoding: br`. No brotli decoder ships with Spark or the
    * JDK, so the decoder is resolved reflectively (org.brotli.dec from
    * the Google reference impl, then brotli4j) — present on a cluster
    * that adds one of those jars, absent here. Without a decoder every
    * `br` body is an error-channel row with an explicit reason, never a
    * throw; the prelude columns (status, content_type) stay usable
    * either way because body decoding is lazy.
    */
  private def brotli(wire: Array[Byte]): Either[String, Array[Byte]] =
    BrotliCtor match {
      case Some(ctor) =>
        try Right(drain(ctor(new ByteArrayInputStream(wire)), wire.length * 4 + 64))
        catch {
          case e: java.io.IOException =>
            Left(s"http: content-encoding decode failed: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
        }
      case None =>
        Left("http: content-encoding 'br' needs a brotli decoder on the classpath (org.brotli:dec or brotli4j)")
    }

  /** First available brotli InputStream wrapper, located once per JVM. */
  private lazy val BrotliCtor: Option[java.io.InputStream => java.io.InputStream] = {
    def byName(cls: String): Option[java.io.InputStream => java.io.InputStream] =
      try {
        val c = Class.forName(cls).getConstructor(classOf[java.io.InputStream])
        Some(in => c.newInstance(in).asInstanceOf[java.io.InputStream])
      } catch { case _: Throwable => None }
    byName("org.brotli.dec.BrotliInputStream")
      .orElse(byName("com.aayushatharva.brotli4j.decoder.BrotliInputStream"))
  }

  private def drain(in: java.io.InputStream, hint: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(hint, 64))
    val buf = new Array[Byte](1 << 14)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // message BUILDING (fixtures and response-record writers)
  // -------------------------------------------------------------------

  /** Serialize an HTTP response message — the payload of a WARC
    * `response` record. `chunked` frames the (possibly gzip'd) entity
    * with chunked transfer encoding split into `chunkSize` pieces;
    * `gzipBody` applies Content-Encoding: gzip first — together they
    * synthesize the wire shapes a real crawl captures.
    */
  def responsePayload(
      status: Int,
      reason: String,
      headers: Seq[(String, String)],
      body: Array[Byte],
      gzipBody: Boolean = false,
      chunked: Boolean = false,
      chunkSize: Int = 1024): Array[Byte] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val entity =
      if (!gzipBody) body
      else {
        val bos = new java.io.ByteArrayOutputStream(body.length / 2 + 64)
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(body); gz.close()
        bos.toByteArray
      }
    val sb = new StringBuilder(256)
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason).append("\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    if (gzipBody) sb.append("Content-Encoding: gzip\r\n")
    if (chunked) sb.append("Transfer-Encoding: chunked\r\n")
    else sb.append("Content-Length: ").append(entity.length).append("\r\n")
    sb.append("\r\n")
    val out = new java.io.ByteArrayOutputStream(entity.length + 512)
    out.write(sb.toString.getBytes(ISO_8859_1))
    if (!chunked) out.write(entity)
    else {
      var off = 0
      while (off < entity.length) {
        val n = math.min(chunkSize, entity.length - off)
        out.write(java.lang.Integer.toHexString(n).getBytes(ISO_8859_1))
        out.write('\r'); out.write('\n')
        out.write(entity, off, n)
        out.write('\r'); out.write('\n')
        off += n
      }
      out.write("0\r\n\r\n".getBytes(ISO_8859_1))
    }
    out.toByteArray
  }
}
