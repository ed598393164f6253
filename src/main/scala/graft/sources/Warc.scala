package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

/** WARC (Web ARChive, ISO 28500) reader/writer.
  *
  * WARC is the interchange format of large-scale web crawls (Common
  * Crawl ships ~100 TB/month of `.warc.gz`), which makes it the most
  * realistic ingest format for a training-data corpus engine. A record
  * is a CRLF-framed header block (`WARC/1.1`, then `Name: value`
  * lines, then a blank line), exactly `Content-Length` payload bytes,
  * and a `\r\n\r\n` trailer; a file is a concatenation of records,
  * conventionally led by a `warcinfo` record.
  *
  * Scale notes (the 100 TB posture):
  *  - A plain `.warc` / member-per-record `.warc.gz` file is only
  *    splittable at record boundaries, which an offset-seeking reader
  *    cannot find without an external index — so the industry-standard
  *    unit of parallelism is the FILE (crawls ship ~1 GB files in the
  *    thousands; one task per file saturates a cluster). The engine
  *    reads through `SparkContext.binaryFiles`' PortableDataStream,
  *    which hands each task a lazily-opened STREAM: a file is parsed
  *    record-by-record in O(record) memory, never materialized whole
  *    (unlike the `binaryFile` DataFrame source, whose `content`
  *    column buffers the entire file in a row).
  *  - Per-member gzip (each record its own gzip member, Common Crawl's
  *    actual layout) is handled transparently: `GZIPInputStream`
  *    advances across concatenated members.
  *  - Malformed framing is a row-level error channel, not an exception
  *    (the reference's per-row error-column discipline,
  *    `/root/reference/main.go:73-80`): the bad record becomes an
  *    `error` row and parsing of THAT FILE stops (past a broken
  *    Content-Length there is no trustworthy resync point), while
  *    other files in the scan are unaffected.
  */
object Warc {

  val Version = "WARC/1.1"

  /** One parsed record. `headers` preserves every raw header; the named
    * fields are the ones the engine's queries project.
    */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      headers: Map[String, String],
      payload: Array[Byte])

  // ---------------------------------------------------------------------
  // Writing
  // ---------------------------------------------------------------------

  private val Crlf = "\r\n".getBytes(UTF_8)

  /** Header names [[writeRecord]] emits itself — a custom header
    * colliding with one of these (case-insensitively) would let a
    * caller forge framing (a bogus `content-length` sorts before the
    * real one and mis-frames every later record), so they are reserved.
    */
  private val ReservedHeaderNames =
    Set("warc-type", "warc-record-id", "warc-target-uri", "content-length")

  /** Serialize one record: header block, payload, record trailer.
    * Header names/values and the URI must be CR/LF-free (a line break
    * would inject framing), and header NAMES must additionally be
    * non-empty, colon-free, not start with SP/HT (which would obs-fold
    * into the previous header), and not collide with the framing
    * headers this writer emits — all fail loudly.
    */
  def writeRecord(out: OutputStream, rec: WarcRecord): Unit = {
    def safe(s: String): String = {
      require(s.indexOf('\r') < 0 && s.indexOf('\n') < 0,
        s"WARC header field contains a line break: '$s'")
      s
    }
    (Seq(rec.warcType, rec.recordId) ++ rec.targetUri ++
      rec.headers.flatMap { case (k, v) => Seq(k, v) }).foreach(safe)
    rec.headers.keys.foreach { k =>
      require(k.nonEmpty && k.indexOf(':') < 0 && !k.head.isWhitespace,
        s"invalid WARC header name: '$k'")
      require(!ReservedHeaderNames(k.toLowerCase),
        s"WARC header name '$k' collides with a framing header")
    }
    val sb = new StringBuilder(256)
    sb.append(Version).append("\r\n")
    sb.append("WARC-Type: ").append(rec.warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(rec.recordId).append("\r\n")
    rec.targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append("\r\n"))
    rec.headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(rec.payload.length).append("\r\n")
    sb.append("\r\n")
    out.write(sb.toString.getBytes(UTF_8))
    out.write(rec.payload)
    out.write(Crlf); out.write(Crlf)
  }

  /** Shard codecs: plain, gzip member-per-record (the Common Crawl
    * layout), or zstd frame-per-record (the IIPC `.warc.zst` layout,
    * including its OPTIONAL leading dictionary frame — a zstd skippable
    * frame carrying a shared dictionary, itself possibly
    * zstd-compressed). Both compressed layouts put each record in its
    * own standalone member/frame so an indexed reader can seek to a
    * byte span and decode ONE record (dictionary-compressed frames
    * additionally need the file-head dictionary, which the seek paths
    * load once per file).
    */
  val CodecNone = "none"
  val CodecGzip = "gzip"
  val CodecZstd = "zstd"

  /** Codec by filename convention (`.warc` / `.warc.gz` / `.warc.zst`). */
  def codecOf(path: String): String =
    if (path.endsWith(".gz")) CodecGzip
    else if (path.endsWith(".zst")) CodecZstd
    else CodecNone

  /** File extension for a codec (inverse of [[codecOf]]). */
  def extOf(codec: String): String = codec match {
    case CodecGzip => "warc.gz"
    case CodecZstd => "warc.zst"
    case CodecNone => "warc"
    case other     => throw new IllegalArgumentException(s"unknown WARC codec '$other'")
  }

  /** Open a shard file for writing, leading with a `warcinfo` record. */
  def shardWriter(path: java.io.File, gzip: Boolean): WarcShardWriter =
    shardWriter(path, if (gzip) CodecGzip else CodecNone)

  def shardWriter(path: java.io.File, codec: String): WarcShardWriter =
    new WarcShardWriter(
      new BufferedOutputStream(new java.io.FileOutputStream(path), 1 << 16),
      codec, path.getName)

  /** Shard writer over ANY sink stream — the cluster-facing spelling: a
    * Hadoop `FileSystem.create` stream writes shards to whatever storage
    * the job's configuration points at (file:/, hdfs:/, s3a:/), exactly
    * like the built-in file sinks. The writer owns (closes) the stream.
    * `zstdDict` (zstd codec only) leads the file with the IIPC
    * dictionary skippable frame and compresses every record frame
    * against it — per-record frames over similar small documents share
    * no history, so a trained dictionary is THE compression lever of
    * the `.warc.zst` layout (see [[trainZstdDict]]).
    */
  def shardWriter(out: OutputStream, codec: String, name: String,
      zstdDict: Option[Array[Byte]] = None): WarcShardWriter =
    new WarcShardWriter(new BufferedOutputStream(out, 1 << 16), codec, name, zstdDict)

  /** zstd skippable-frame magic range (LE), per RFC 8878 §3.1.2. The
    * IIPC `.warc.zst` spec stores the shared dictionary in one of these
    * at the start of the file.
    */
  private[sources] val ZstdSkippableMagicLo = 0x184D2A50
  private[sources] val ZstdSkippableMagicHi = 0x184D2A5F
  /** The IIPC .warc.zst spec pins the DICTIONARY frame to this specific
    * skippable magic (0x184D2A5D) — we WRITE exactly that so spec-literal
    * third-party tools recognize graft-written dictionaries, while the
    * reader keeps accepting the whole skippable range (liberal in what
    * it accepts).
    */
  private[sources] val ZstdDictFrameMagic = 0x184D2A5D
  private[sources] val ZstdFrameMagic = 0xFD2FB528

  /** Train a zstd dictionary from sample payloads (the caller bounds the
    * sample — model-state discipline: a few hundred documents suffice).
    * None when the samples are too small/uniform for the trainer.
    */
  def trainZstdDict(samples: Seq[Array[Byte]], dictSize: Int = 16 * 1024): Option[Array[Byte]] = {
    val total = samples.map(_.length).sum
    if (total < 4 * dictSize) return None // trainer needs ~a few x dict size
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(total, dictSize)
    samples.foreach(trainer.addSample)
    try Some(trainer.trainSamples())
    catch { case _: com.github.luben.zstd.ZstdException => None }
  }

  /** Counts logical bytes BEFORE buffering, so member offsets are exact
    * at write time (the buffer sits below the counter).
    */
  private final class CountingOutputStream(out: OutputStream) extends OutputStream {
    var count = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); count += len
    }
    override def flush(): Unit = out.flush()
    override def close(): Unit = out.close()
  }

  final class WarcShardWriter(
      sink: OutputStream, codec: String, name: String,
      zstdDict: Option[Array[Byte]] = None) {
    require(codec == CodecNone || codec == CodecGzip || codec == CodecZstd,
      s"unknown WARC codec '$codec'")
    require(zstdDict.isEmpty || codec == CodecZstd,
      "a compression dictionary is a .warc.zst feature")
    private val raw = new CountingOutputStream(sink)
    // ONE reused native compression context per shard, reset per member.
    // The naive spelling (a fresh GZIPOutputStream per record) allocates
    // a native zlib context per record and never `end()`s it — measured
    // 173 s for a 500k-record shard set vs ~4 s with the reused deflater
    // (the stream class has no reset, so the member framing is written
    // by hand: 10-byte header, raw-deflate body, CRC32+ISIZE trailer).
    // The zstd path applies the same rule from the start: one
    // ZstdCompressCtx per shard, one complete frame per record.
    private val deflater =
      if (codec == CodecGzip)
        new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      else null
    private val zctx =
      if (codec == CodecZstd) new com.github.luben.zstd.ZstdCompressCtx().setLevel(3)
      else null
    private val crc = new java.util.zip.CRC32
    private val defBuf = new Array[Byte](1 << 16)
    // IIPC dictionary frame: a zstd SKIPPABLE frame (magic + LE size +
    // dictionary bytes) leading the file; every record frame after it is
    // compressed against the loaded dictionary
    zstdDict.foreach { d =>
      writeIntLE(ZstdDictFrameMagic.toLong & 0xffffffffL)
      writeIntLE(d.length.toLong)
      raw.write(d)
      zctx.loadDict(d); ()
    }
    writeOne(WarcRecord(
      "warcinfo", s"urn:graft:warcinfo:$name", None,
      Map("Content-Type" -> "application/warc-fields"),
      "software: graft-engine\r\n".getBytes(UTF_8)))

    private def writeIntLE(v: Long): Unit = {
      raw.write((v & 0xff).toInt); raw.write(((v >> 8) & 0xff).toInt)
      raw.write(((v >> 16) & 0xff).toInt); raw.write(((v >> 24) & 0xff).toInt)
    }

    private def recordBytes(rec: WarcRecord): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(rec.payload.length + 256)
      writeRecord(bos, rec)
      bos.toByteArray
    }

    private def writeOne(rec: WarcRecord): (Long, Long) = {
      val start = raw.count
      if (codec == CodecGzip) {
        // one gzip member per record (the Common Crawl layout, so an
        // indexed reader can seek to a member and inflate one record)
        val data = recordBytes(rec)
        // header: magic, CM=deflate, no flags/mtime/XFL, OS=unknown
        raw.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
        deflater.reset()
        deflater.setInput(data)
        deflater.finish()
        while (!deflater.finished()) {
          val n = deflater.deflate(defBuf)
          if (n > 0) raw.write(defBuf, 0, n)
        }
        crc.reset(); crc.update(data)
        writeIntLE(crc.getValue)
        writeIntLE(data.length.toLong)
      } else if (codec == CodecZstd) {
        // one complete zstd frame per record (the .warc.zst layout)
        val frame = zctx.compress(recordBytes(rec))
        raw.write(frame)
      } else writeRecord(raw, rec)
      (start, raw.count - start)
    }

    /** Write one record; returns its member's `(byteOffset, byteLength)`
      * in the shard file — the CDX-style index entry that makes the
      * shard randomly accessible (a gz member inflates standalone; a
      * plain-WARC span parses standalone).
      */
    def write(rec: WarcRecord): (Long, Long) = writeOne(rec)
    /** Logical bytes emitted so far (member offsets are exact at write
      * time — the buffer sits below the counter). After construction
      * this is the leading warcinfo member's length.
      */
    def bytesWritten: Long = raw.count
    def close(): Unit = {
      raw.flush(); raw.close()
      if (deflater != null) deflater.end()
      if (zctx != null) zctx.close()
    }
  }

  // ---------------------------------------------------------------------
  // Record interpretation: the engine's column view of a parsed record
  // ---------------------------------------------------------------------

  /** Payload-derived columns of one record, shared by the RDD reader and
    * the DSv2 connector so the two paths cannot drift:
    *
    *  - a `response` record with Content-Type `application/http` (what a
    *    real crawl ships — every Common Crawl record is this shape) is
    *    parsed as a captured HTTP message: `httpStatus` is its status
    *    code, `contentType` the HTTP entity's lowercased media type, and
    *    `text` the body decoded under the message's OWN charset
    *    (Content-Type `charset=`, UTF-8 fallback), after undoing chunked
    *    transfer-encoding and gzip/deflate content-encoding. Non-`text/`-class
    *    entities keep `text` null (the record is fine, it isn't text);
    *    malformed wire bytes / unknown charsets / mojibake land in
    *    `error` — the row-level error channel, never an exception.
    *  - any other record (the engine's own `resource` corpus, warcinfo)
    *    keeps the r11 behavior: `text` is the UTF-8 payload,
    *    `contentType` the WARC Content-Type header's media type,
    *    `httpStatus` null.
    */
  final case class PayloadView(
      httpStatus: Option[Int],
      contentType: String,
      text: String,
      error: String)

  /** Case-insensitive header lookup (first match wins). */
  def headerOf(headers: Map[String, String], k: String): String =
    headers.collectFirst { case (hk, v) if hk.equalsIgnoreCase(k) => v }.orNull

  /** Is this record a captured HTTP response message (ISO 28500 §6.3)? */
  def isHttpResponse(warcType: String, recordContentType: String): Boolean =
    warcType != null && warcType.equalsIgnoreCase("response") &&
      recordContentType != null &&
      recordContentType.toLowerCase.startsWith("application/http")

  /** Is this a `revisit` record carrying an HTTP prelude (ISO 28500
    * §6.7.2 — a deduplicating crawler's identical-payload-digest
    * record: the response HEADERS are stored, the body lives at the
    * record named by WARC-Refers-To)?
    */
  def isHttpRevisit(warcType: String, recordContentType: String): Boolean =
    warcType != null && warcType.equalsIgnoreCase("revisit") &&
      recordContentType != null &&
      recordContentType.toLowerCase.startsWith("application/http")

  /** `needBody = false` skips ALL body work — transfer/content decoding
    * and charset decode for response records, UTF-8 decode for resource
    * records — returning null `text`/`error`-from-body. Only correct
    * when the caller provably never reads those columns (the DSv2
    * reader's pruning contract); `httpStatus`/`contentType` are
    * prelude-only either way, so their values can never depend on the
    * projection.
    */
  def payloadView(rec: WarcRecord, needBody: Boolean = true): PayloadView = {
    val recCt = headerOf(rec.headers, "Content-Type")
    if (isHttpResponse(rec.warcType, recCt)) {
      HttpWire.parseResponse(rec.payload) match {
        case Left(err) => PayloadView(None, null, null, err)
        case Right(r) if !needBody => PayloadView(Some(r.status), r.mime, null, null)
        case Right(r) =>
          HttpWire.decodeTextBody(r) match {
            case Left(err)   => PayloadView(Some(r.status), r.mime, null, err)
            case Right(body) => PayloadView(Some(r.status), r.mime, body.orNull, null)
          }
      }
    } else if (isHttpRevisit(rec.warcType, recCt)) {
      // revisit policy (pinned): status/mime from the STORED prelude,
      // `text` NULL always — the payload lives at the record named by
      // WARC-Refers-To, and resolving it is a relational join against
      // that record (q_warc_revisit), never a reader-side fetch. A
      // malformed stored prelude is error-channel data like any other.
      HttpWire.parseResponse(rec.payload) match {
        case Left(err) => PayloadView(None, null, null, err)
        case Right(r)  => PayloadView(Some(r.status), r.mime, null, null)
      }
    } else {
      PayloadView(None, HttpWire.mimeOf(recCt),
        if (needBody) new String(rec.payload, UTF_8) else null, null)
    }
  }

  // ---------------------------------------------------------------------
  // Parsing
  // ---------------------------------------------------------------------

  /** Read one header line (terminated by LF, tolerant of a bare-LF
    * writer; the trailing CR is stripped). Returns null at EOF before
    * any byte.
    */
  private def readLine(in: InputStream): String = {
    val buf = new ArrayBuffer[Byte](96)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      buf += b.toByte
      // bound the line: garbage input with no LF (a binary file dropped
      // in the landing dir) must cost one cheap error row, not an
      // executor-sized buffer of the whole shard
      if (buf.length > MaxHeaderLineBytes)
        throw new java.io.IOException(
          s"header line exceeds $MaxHeaderLineBytes bytes — not a WARC stream")
      b = in.read()
    }
    val n = if (buf.nonEmpty && buf.last == '\r') buf.length - 1 else buf.length
    new String(buf.toArray, 0, n, UTF_8)
  }

  /** Longest header line the parser accepts (spec headers are tiny; a
    * longer "line" means the bytes are not a WARC header block).
    */
  val MaxHeaderLineBytes: Int = 64 * 1024

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n - off)
      if (r < 0) throw new EOFException(s"payload truncated at $off/$n bytes")
      off += r
    }
    out
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() < 0)
        throw new EOFException(s"payload truncated while skipping (${n - left}/$n bytes)")
      else left -= 1
    }
  }

  /** Detect and consume the IIPC dictionary frame at the head of a
    * `.warc.zst` stream: a zstd SKIPPABLE frame (RFC 8878 magic range)
    * whose payload is the shared dictionary — returned decompressed
    * when the dictionary is itself a zstd frame (the spec allows both).
    * When the stream does not start with a skippable frame the peeked
    * bytes are pushed back untouched.
    */
  private[sources] def readZstdDictFrame(
      pb: java.io.PushbackInputStream): Option[Array[Byte]] = {
    val hdr = new Array[Byte](8)
    var n = 0
    var r = 0
    while (n < 8 && { r = pb.read(hdr, n, 8 - n); r > 0 }) n += r
    def le(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    val magic = if (n >= 4) le(hdr, 0) else -1L
    val skippable = magic >= (ZstdSkippableMagicLo.toLong & 0xffffffffL) &&
      magic <= (ZstdSkippableMagicHi.toLong & 0xffffffffL)
    if (n < 8 || !skippable) {
      if (n > 0) pb.unread(hdr, 0, n)
      return None
    }
    val size = le(hdr, 4)
    // a dictionary is tens of KB; a huge "size" means corrupt framing
    if (size > (64L << 20))
      throw new java.io.IOException(s"zstd dictionary frame claims $size bytes — corrupt")
    val dict = readFully(pb, size.toInt)
    if (dict.length >= 4 && le(dict, 0) == (ZstdFrameMagic.toLong & 0xffffffffL)) {
      // the dictionary itself ships zstd-compressed
      val zin = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(dict))
      val out = new java.io.ByteArrayOutputStream(dict.length * 4)
      val buf = new Array[Byte](1 << 14)
      var k = zin.read(buf)
      while (k >= 0) { out.write(buf, 0, k); k = zin.read(buf) }
      Some(out.toByteArray)
    } else Some(dict)
  }

  /** Load the file-head dictionary of a `.warc.zst`, if present — the
    * once-per-file step a SEEK reader needs before decoding spans of a
    * dictionary-compressed shard (the spans themselves are bare frames).
    * Reads only the head bytes; the stream position afterwards is
    * unspecified (callers use positioned reads).
    */
  def readZstdDict(open: => InputStream): Option[Array[Byte]] = {
    val in = open
    try {
      val pb = new java.io.PushbackInputStream(new BufferedInputStream(in, 1 << 16), 8)
      readZstdDictFrame(pb)
    } finally in.close()
  }

  /** `available()` that answers by PEEKING (one blocking read +
    * unread) instead of trusting the source's estimate.
    * `GZIPInputStream` decides whether a concatenated stream has
    * another member by `in.available() > 0` — Hadoop streams
    * (HDFS/S3) routinely report 0 at a member boundary, which would
    * make the reader declare EOF and SILENTLY drop every remaining
    * record in the shard. Local `FileInputStream.available()` is
    * always positive, so only cluster runs would have hit it.
    */
  private final class PeekAvailableInputStream(in: java.io.PushbackInputStream)
      extends InputStream {
    override def read(): Int = in.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int = in.read(b, off, len)
    override def available(): Int = {
      val b = in.read()
      if (b < 0) 0 else { in.unread(b); 1 }
    }
    override def close(): Unit = in.close()
  }

  /** Parse every record in a stream. Returns Right(record) per parsed
    * record. Error semantics (the row-level error channel):
    *  - an over-sized payload (> `maxBufferedPayload`, default the JVM
    *    array limit) yields one Left and is SKIPPED — later records in
    *    the shard still parse (Content-Length is trusted framing);
    *  - any other framing/IO/decompression error (including corrupt
    *    gzip bytes) yields one Left and ENDS the file's iterator —
    *    past broken framing there is no trustworthy resync point;
    *  - an empty stream (zero bytes) is a clean zero-record parse.
    * Exceptions never escape: a poisoned shard costs error rows, not a
    * task (for a stream, a permanently-wedged retry loop). The caller
    * owns closing the underlying stream.
    */
  /** `keepPayload` is the projection hook for readers that can prove —
    * from the HEADERS alone — that a record's payload will never be
    * consumed (a pruned scan without the text column, a pushed header
    * filter the record fails): when it returns false the payload bytes
    * are SKIPPED (never buffered or UTF-8-decoded) and the record is
    * emitted with an empty payload. Framing is unaffected either way.
    */
  def parseStream(
      raw: InputStream,
      gzipped: Boolean): Iterator[Either[String, WarcRecord]] =
    parseStream(raw, if (gzipped) CodecGzip else CodecNone)

  def parseStream(
      raw: InputStream,
      gzipped: Boolean,
      maxBufferedPayload: Long): Iterator[Either[String, WarcRecord]] =
    parseStream(raw, if (gzipped) CodecGzip else CodecNone, maxBufferedPayload)

  /** `zstdDict` (zstd codec only): explicit dictionary for decoding a
    * byte SPAN of a dictionary-compressed `.warc.zst` — a seeked frame
    * doesn't contain the file-head dictionary frame, so the seek paths
    * load it once per file ([[readZstdDict]]) and pass it here. When the
    * stream itself starts with a dictionary frame (a whole-file read),
    * the in-stream dictionary wins.
    */
  def parseStream(
      raw: InputStream,
      codec: String,
      maxBufferedPayload: Long = Int.MaxValue - 8L,
      keepPayload: Map[String, String] => Boolean = _ => true,
      zstdDict: Option[Array[Byte]] = None): Iterator[Either[String, WarcRecord]] = {
    new Iterator[Either[String, WarcRecord]] {
      private var in: InputStream = _
      private var done = false
      private var pending: Either[String, WarcRecord] = _
      private var loaded = false

      private def fail(msg: String): Either[String, WarcRecord] = { done = true; Left(msg) }

      /** Lazily build the decode stack so constructor-time failures
        * (e.g. `GZIPInputStream` on a corrupt header) land in the
        * error channel too. Returns false for an empty source.
        */
      private def ensureOpen(): Boolean = {
        if (in != null) return true
        val pb = new java.io.PushbackInputStream(new BufferedInputStream(raw, 1 << 16), 8)
        val first = pb.read()
        if (first < 0) { done = true; return false } // empty file: clean zero records
        pb.unread(first)
        in = codec match {
          case CodecGzip =>
            new BufferedInputStream(
              new GZIPInputStream(new PeekAvailableInputStream(pb), 1 << 16), 1 << 16)
          case CodecZstd =>
            // zstd-jni's stream reads across concatenated frames and has
            // no available()-based continuation heuristic to defuse.
            // IIPC optional dictionary frame: when the stream leads with
            // a skippable frame, its payload is the shared dictionary
            // every later frame was compressed against.
            val dict = readZstdDictFrame(pb).orElse(zstdDict)
            val zin = new com.github.luben.zstd.ZstdInputStream(pb)
            dict.foreach(zin.setDict)
            new BufferedInputStream(zin, 1 << 16)
          case CodecNone => new BufferedInputStream(pb, 1 << 16)
          case other => throw new java.io.IOException(s"unknown WARC codec '$other'")
        }
        true
      }

      private def advance(): Unit = {
        pending = null
        if (done) return
        try {
          if (!ensureOpen()) return
          // Version line; EOF here is the clean end of the file. Tolerate
          // stray blank lines between records (some writers pad).
          var line = readLine(in)
          while (line != null && line.isEmpty) line = readLine(in)
          if (line == null) { done = true; return }
          if (!line.startsWith("WARC/")) { pending = fail(s"expected WARC version line, got '$line'"); return }
          // Header block up to the blank line, with simple obs-fold
          // (continuation lines start with SP/HT) appended to the prior
          // header.
          val headers = scala.collection.mutable.LinkedHashMap[String, String]()
          var lastKey: String = null
          var h = readLine(in)
          while (h != null && h.nonEmpty) {
            if ((h.charAt(0) == ' ' || h.charAt(0) == '\t') && lastKey != null) {
              headers(lastKey) = headers(lastKey) + " " + h.trim
            } else {
              val i = h.indexOf(':')
              if (i < 0) { pending = fail(s"malformed header line '$h'"); return }
              lastKey = h.substring(0, i).trim
              headers(lastKey) = h.substring(i + 1).trim
            }
            h = readLine(in)
          }
          if (h == null) { pending = fail("EOF inside header block"); return }
          val lenStr = headers.iterator.collectFirst {
            case (k, v) if k.equalsIgnoreCase("Content-Length") => v
          }.orNull
          if (lenStr == null) { pending = fail("missing Content-Length"); return }
          // Long, not Int: the spec's digit field is unbounded, and a
          // 3 GB record must SKIP cleanly rather than kill the shard
          val len =
            try lenStr.toLong
            catch { case _: NumberFormatException => pending = fail(s"bad Content-Length '$lenStr'"); return }
          if (len < 0) { pending = fail(s"bad Content-Length '$lenStr'"); return }
          if (len > maxBufferedPayload) {
            skipFully(in, len) // framing stays trusted: later records survive
            pending = Left(s"payload too large to buffer ($len bytes), record skipped")
            return
          }
          val headerMap = headers.toMap
          val payload =
            if (keepPayload(headerMap)) readFully(in, len.toInt)
            else { skipFully(in, len); Array.emptyByteArray }
          val get = (k: String) => headers.iterator.collectFirst {
            case (hk, v) if hk.equalsIgnoreCase(k) => v
          }
          pending = Right(WarcRecord(
            get("WARC-Type").getOrElse(""),
            get("WARC-Record-ID").getOrElse(""),
            get("WARC-Target-URI"),
            headerMap,
            payload))
        } catch {
          // EOFException (truncation), ZipException (corrupt gzip), and
          // any other IO failure all land in the error channel
          case e: java.io.IOException =>
            pending = fail(
              if (e.getMessage != null) e.getMessage else e.getClass.getSimpleName)
        }
      }

      def hasNext: Boolean = {
        if (!loaded) { advance(); loaded = true }
        pending != null
      }
      def next(): Either[String, WarcRecord] = {
        if (!hasNext) throw new NoSuchElementException
        loaded = false
        pending
      }
    }
  }
}
