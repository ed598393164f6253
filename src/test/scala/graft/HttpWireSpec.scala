package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8, UTF_16BE}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpWire

/** HTTP/1.x response-message parsing — the payload shape of real-crawl
  * WARC `response` records. Pure wire-level unit tests: status line,
  * header block, charset resolution, chunked transfer decoding,
  * gzip/deflate content decoding, and the error-channel contract
  * (malformed wire bytes return Left, never throw).
  */
class HttpWireSpec extends AnyFunSuite {

  private def msg(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  test("status line + headers + identity body parse; first duplicate header wins") {
    val r = HttpWire.parseResponse(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        "X-Dup: first\r\nX-Dup: second\r\nContent-Length: 5\r\n\r\nhello")).toOption.get
    assert(r.status == 200)
    assert(r.mime == "text/html")
    assert(r.charsetName == "utf-8")
    assert(r.header("x-dup").contains("first")) // case-insensitive, first wins
    assert(new String(r.body, UTF_8) == "hello")
  }

  test("obs-fold header continuation and bare-LF line endings are tolerated") {
    val r = HttpWire.parseResponse(msg(
      "HTTP/1.0 301 Moved\nLocation: https://a.example/\n very/long/path\n\nbody")).toOption.get
    assert(r.status == 301)
    assert(r.header("Location").contains("https://a.example/ very/long/path"))
    assert(new String(r.body, UTF_8) == "body")
  }

  test("charset parameter: quoted, unquoted, mixed case; absent -> null") {
    def cs(ct: String): String =
      HttpWire.parseResponse(msg(s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\nx"))
        .toOption.get.charsetName
    assert(cs("text/html; charset=ISO-8859-1") == "ISO-8859-1")
    assert(cs("text/html; CHARSET=\"utf-8\"") == "utf-8")
    assert(cs("text/html;charset=utf-16be;boundary=x") == "utf-16be")
    assert(cs("text/html") == null)
  }

  test("decodeTextBody honors the message's own charset; utf-8 fallback when undeclared") {
    def dec(ct: String, body: Array[Byte]): Either[String, Option[String]] =
      HttpWire.decodeTextBody(HttpWire.parseResponse(
        (msg(s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n") ++ body)).toOption.get)
    assert(dec("text/plain; charset=utf-16be", "héllo → wörld".getBytes(UTF_16BE)) ==
      Right(Some("héllo → wörld")))
    assert(dec("text/plain; charset=iso-8859-1", "héllo".getBytes(ISO_8859_1)) ==
      Right(Some("héllo")))
    assert(dec("text/plain", "héllo → wörld".getBytes(UTF_8)) ==
      Right(Some("héllo → wörld")))
  }

  test("gating and the error channel: non-text None; unknown charset / mojibake Left") {
    def dec(ct: String, body: Array[Byte]) =
      HttpWire.decodeTextBody(HttpWire.parseResponse(
        (msg(s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n") ++ body)).toOption.get)
    assert(dec("image/gif", Array[Byte](0x47, 0x49, 0xff.toByte)) == Right(None))
    assert(dec("application/pdf", "text-ish".getBytes(UTF_8)) == Right(None))
    assert(dec("text/html; charset=klingon-9", "x".getBytes(UTF_8)).isLeft)
    // invalid utf-8 under a STRICT decode is an error, not silent
    // mojibake (0xFF 0xFF: invalid in utf-8 AND not one of the three
    // WHATWG BOMs — 0xFF 0xFE would now legitimately decode as a
    // BOM'd utf-16le document)
    assert(dec("text/html; charset=utf-8", Array[Byte](0xff.toByte, 0xff.toByte)).isLeft)
  }

  test("chunked transfer-encoding is de-chunked (sizes in hex, extensions ignored)") {
    val r = HttpWire.parseResponse(msg(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
        "Content-Type: text/plain\r\n\r\n" +
        "5;ext=1\r\nhello\r\n8\r\n, chunks\r\n0\r\n\r\n")).toOption.get
    // parseResponse is prelude-only: raw chunked bytes until decode
    assert(new String(r.body, UTF_8).startsWith("5;ext=1"))
    assert(HttpWire.decodeTextBody(r) == Right(Some("hello, chunks")))
  }

  test("gzip and deflate content-encodings are undone; unsupported ones are Left") {
    val payload = HttpWire.responsePayload(200, "OK",
      Seq("Content-Type" -> "text/plain; charset=utf-8"),
      "compress me → please".getBytes(UTF_8), gzipBody = true)
    val r = HttpWire.parseResponse(payload).toOption.get
    assert(HttpWire.decodeTextBody(r) == Right(Some("compress me → please")))
    // deflate (zlib-wrapped)
    val zb = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos)
      d.write("deflated".getBytes(UTF_8)); d.close()
      bos.toByteArray
    }
    val r2 = HttpWire.parseResponse(
      msg("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\nContent-Type: text/plain\r\n\r\n") ++ zb)
      .toOption.get
    assert(HttpWire.decodeTextBody(r2) == Right(Some("deflated")))
    // an unsupported encoding is a BODY-decode error: the prelude (and
    // therefore status/mime) stays well-defined
    val br = HttpWire.parseResponse(
      msg("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\nContent-Type: text/plain\r\n\r\nx"))
      .toOption.get
    assert(br.status == 200 && br.mime == "text/plain")
    assert(HttpWire.decodeTextBody(br).isLeft)
    // ...and is never even looked at for a non-text entity
    val brGif = HttpWire.parseResponse(
      msg("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\nContent-Type: image/gif\r\n\r\nx"))
      .toOption.get
    assert(HttpWire.decodeTextBody(brGif) == Right(None))
  }

  test("chunked + gzip compose (transfer decoding before content decoding)") {
    val payload = HttpWire.responsePayload(200, "OK",
      Seq("Content-Type" -> "text/plain; charset=utf-8"),
      ("repeat " * 500).getBytes(UTF_8), gzipBody = true, chunked = true, chunkSize = 100)
    val r = HttpWire.parseResponse(payload).toOption.get
    assert(HttpWire.decodeTextBody(r) == Right(Some("repeat " * 500)))
  }

  test("malformed wire bytes are Left, never a throw") {
    // prelude-level failures
    assert(HttpWire.parseResponse(msg("not http at all")).isLeft)
    assert(HttpWire.parseResponse(msg("HTTP/1.1 abc Bad\r\n\r\n")).isLeft)
    assert(HttpWire.parseResponse(msg("HTTP/1.1 200 OK\r\nNoColonHere\r\n\r\nx")).isLeft)
    // truncated header block (no blank line)
    assert(HttpWire.parseResponse(msg("HTTP/1.1 200 OK\r\nContent-Type: text/html")).isLeft)
    // body-level failures: prelude parses, decodeTextBody errors
    def bodyOf(s: String) =
      HttpWire.decodeTextBody(HttpWire.parseResponse(msg(s)).toOption.get)
    assert(bodyOf("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Type: text/plain\r\n\r\nzz\r\n").isLeft)
    assert(bodyOf("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Type: text/plain\r\n\r\nffffffff\r\nx").isLeft)
    assert(bodyOf("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Type: text/plain\r\n\r\nnot gzip").isLeft)
  }

  test("negative chunk size is an error-channel Left, not an out-of-bounds throw") {
    // Long.parseLong(_, 16) accepts '-1'; the write must not be reached
    val r = HttpWire.parseResponse(msg(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
        "Content-Type: text/plain\r\n\r\n-1\r\nx\r\n0\r\n\r\n")).toOption.get
    assert(HttpWire.decodeTextBody(r) == Left("http: bad chunk size '-1'"))
  }

  test("raw (non-zlib) deflate bodies decode via the nowrap fallback") {
    val raw = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos, new java.util.zip.Deflater(-1, true))
      d.write("raw deflate, as many real servers send it".getBytes(UTF_8)); d.close()
      bos.toByteArray
    }
    val r = HttpWire.parseResponse(
      msg("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\nContent-Type: text/plain\r\n\r\n") ++ raw)
      .toOption.get
    assert(HttpWire.decodeTextBody(r) == Right(Some("raw deflate, as many real servers send it")))
    // garbage that is neither zlib nor raw deflate still errors
    val bad = HttpWire.parseResponse(
      msg("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\nContent-Type: text/plain\r\n\r\n!!notdeflate!!"))
      .toOption.get
    assert(HttpWire.decodeTextBody(bad).isLeft)
  }

  test("brotli without a decoder on the classpath is a clear error-channel reason") {
    val r = HttpWire.parseResponse(
      msg("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\nContent-Type: text/plain\r\n\r\nxx"))
      .toOption.get
    val e = HttpWire.decodeTextBody(r)
    assert(e.isLeft && e.swap.toOption.get.contains("brotli"))
  }

  test("meta-charset prescan: used when the header declares none, header wins otherwise") {
    def html(ct: String, doc: String, cs: java.nio.charset.Charset) =
      HttpWire.decodeTextBody(HttpWire.parseResponse(
        msg(s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n") ++ doc.getBytes(cs)).toOption.get)
    val doc1252 = "<html><head><meta charset=\"windows-1252\"></head><body>café</body></html>"
    // 0xE9 is invalid UTF-8, so without the prescan this would be Left
    assert(html("text/html", doc1252, java.nio.charset.Charset.forName("windows-1252")) ==
      Right(Some(doc1252)))
    // http-equiv spelling
    val docEquiv = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head><body>naïve</body></html>"
    assert(html("text/html", docEquiv, ISO_8859_1) == Right(Some(docEquiv)))
    // the header's explicit charset wins over a conflicting meta
    val conflict = "<html><meta charset=\"utf-16be\"><body>plain ascii</body></html>"
    assert(html("text/html; charset=utf-8", conflict, UTF_8) == Right(Some(conflict)))
    // non-HTML text never consults markup: invalid utf-8 stays an error
    val notHtml = "<meta charset=\"windows-1252\"> café"
    assert(html("text/plain", notHtml, java.nio.charset.Charset.forName("windows-1252")).isLeft)
  }

  test("WHATWG prescan fixups: utf-16 labels mean utf-8, x-user-defined means windows-1252, attribute-only matching") {
    def html(ct: String, doc: String, cs: java.nio.charset.Charset) =
      HttpWire.decodeTextBody(HttpWire.parseResponse(
        msg(s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n") ++ doc.getBytes(cs)).toOption.get)
    // a meta-declared utf-16 family label must decode as UTF-8 (a real
    // utf-16 page can't have an ASCII-readable prescan); the body here
    // is utf-8 with a multibyte char, so a literal utf-16 decode would
    // produce garbage/Left rather than round-trip
    for (label <- Seq("utf-16", "UTF-16BE", "utf-16le")) {
      val doc = s"""<html><meta charset="$label"><body>café</body></html>"""
      assert(html("text/html", doc, UTF_8) == Right(Some(doc)), label)
    }
    // x-user-defined maps to windows-1252
    val xud = "<html><meta charset=x-user-defined><body>café</body></html>"
    assert(html("text/html", xud,
      java.nio.charset.Charset.forName("windows-1252")) == Right(Some(xud)))
    // charset= INSIDE another attribute's value is not a declaration:
    // this page declares nothing, falls back to utf-8, and its 1252
    // bytes are a strict-decode error — a regex over the raw tag text
    // would have (wrongly) decoded it
    val inValue = "<html><meta name=\"description\" " +
      "content=\"how to set charset=windows-1252 in html\"><body>café</body></html>"
    assert(html("text/html", inValue,
      java.nio.charset.Charset.forName("windows-1252")).isLeft)
    // content= without the http-equiv=content-type pragma is ignored too
    val noPragma = "<html><meta content=\"text/html; charset=windows-1252\">" +
      "<body>café</body></html>"
    assert(html("text/html", noPragma,
      java.nio.charset.Charset.forName("windows-1252")).isLeft)
    // <metadata> is not <meta>
    val metadata = "<html><metadata charset=\"windows-1252\"></metadata>" +
      "<body>café</body></html>"
    assert(html("text/html", metadata,
      java.nio.charset.Charset.forName("windows-1252")).isLeft)
    // unquoted and single-quoted attribute values still parse
    val unq = "<html><meta charset=windows-1252><body>café</body></html>"
    assert(html("text/html", unq,
      java.nio.charset.Charset.forName("windows-1252")) == Right(Some(unq)))
    val sq = "<html><meta charset='windows-1252'><body>café</body></html>"
    assert(html("text/html", sq,
      java.nio.charset.Charset.forName("windows-1252")) == Right(Some(sq)))
  }

  test("BOM outranks header and meta charsets and is stripped from the text") {
    def decode(ct: String, body: Array[Byte]) =
      HttpWire.decodeTextBody(HttpWire.parseResponse(
        msg(s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n") ++ body).toOption.get)
    val doc = "<html><body>plain ascii über</body></html>"
    val le = java.nio.charset.StandardCharsets.UTF_16LE
    val bomLE = Array[Byte](0xFF.toByte, 0xFE.toByte)
    val bomBE = Array[Byte](0xFE.toByte, 0xFF.toByte)
    val bom8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    // no header charset: the BOM resolves the encoding, and the decoded
    // text carries no U+FEFF
    assert(decode("text/html", bomLE ++ doc.getBytes(le)) == Right(Some(doc)))
    assert(decode("text/html", bomBE ++ doc.getBytes(UTF_16BE)) == Right(Some(doc)))
    assert(decode("text/html", bom8 ++ doc.getBytes(UTF_8)) == Right(Some(doc)))
    // BOM beats a CONTRADICTING header charset (the WHATWG order —
    // a strict utf-8 decode of these bytes would be Left)
    assert(decode("text/html; charset=utf-8", bomLE ++ doc.getBytes(le)) ==
      Right(Some(doc)))
    // BOM beats a contradicting meta declaration too (the fixture's
    // wrap declares <meta charset="utf-8"> while the body is utf-16le)
    val metaDoc = "<html><head><meta charset=\"utf-8\"/></head><body>x</body></html>"
    assert(decode("text/html", bomLE ++ metaDoc.getBytes(le)) ==
      Right(Some(metaDoc)))
    // BOM-less bodies are untouched (no false sniff on ascii)
    assert(decode("text/html; charset=utf-8", doc.getBytes(UTF_8)) ==
      Right(Some(doc)))
  }

  test("header-only message (no body) parses with an empty body") {
    val r = HttpWire.parseResponse(msg("HTTP/1.1 204 No Content\r\nServer: x\r\n\r\n")).toOption.get
    assert(r.status == 204 && r.body.isEmpty)
  }

  test("mimeOf strips parameters and lowercases") {
    assert(HttpWire.mimeOf("Text/HTML; charset=utf-8") == "text/html")
    assert(HttpWire.mimeOf("application/http;msgtype=response") == "application/http")
    assert(HttpWire.mimeOf(null) == null)
    assert(HttpWire.mimeOf("  ;x=y") == null)
  }
}
