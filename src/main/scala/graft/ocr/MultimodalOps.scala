package graft.ocr

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest

import javax.imageio.ImageIO

/** Multimodal-column operators (SURVEY.md §2C): media travels as an opaque
  * `binary` column plus typed metadata, the row shape a 100 TB training-
  * data pipeline uses for image/audio/video.
  *
  * What's real vs stubbed in this environment:
  *  - image header/metadata decode and image resize are REAL (java.awt /
  *    javax.imageio ship with the JVM);
  *  - WAV audio decode + featurization is REAL (javax.sound.sampled ships
  *    with the JVM — [[audioFeatures]]), with a stub fallback for bytes
  *    that aren't decodable PCM WAV;
  *  - video frame sampling and the legacy byte-level audio stub remain
  *    DETERMINISTIC STUBS (no video/compressed-audio codec libraries in
  *    the container — SURVEY.md §7.4): the Spark-side plumbing (schema,
  *    batch shape, per-partition execution) is real and tested, the codec
  *    call is a fixed fake keyed on content hash so results are
  *    reproducible.
  */
object MultimodalOps {

  final case class MediaMeta(
      format: String, width: Int, height: Int, n_bytes: Long, valid: Boolean)

  final case class Frame(index: Int, offset_ms: Long, frame_id: String)

  final case class AudioFeatures(
      n_samples: Long, mean_amplitude: Double, rms: Double, clip_id: String)

  /** REAL image metadata via ImageIO header sniffing (format is detected
    * from magic bytes, never the file extension).
    */
  def imageMeta(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null) return MediaMeta(null, -1, -1, 0L, valid = false)
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) MediaMeta(null, -1, -1, bytes.length.toLong, valid = false)
      else {
        val r = readers.next()
        r.setInput(iis)
        val meta = MediaMeta(
          r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
          bytes.length.toLong, valid = true)
        r.dispose()
        meta
      }
    } catch {
      case _: Exception => MediaMeta(null, -1, -1, bytes.length.toLong, valid = false)
    }
  }

  /** REAL image resize (bilinear) — returns re-encoded PNG bytes. */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    ImageOps.decode(bytes) match {
      case Left(_) => null
      case Right(img) =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val baos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", baos)
        baos.toByteArray
    }

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** STUB video frame sampler: no video codec exists in this container, so
    * this emits `fps`-spaced deterministic frame descriptors whose ids are
    * content-hash-derived. Schema/partitioning/batch shape match what a
    * real decoder would produce.
    */
  def sampleFramesStub(video: Array[Byte], durationMs: Long, fps: Double): Seq[Frame] = {
    if (video == null || durationMs <= 0 || fps <= 0) return Seq.empty
    val base = md5hex(video)
    val stepMs = (1000.0 / fps).toLong.max(1L)
    (0L until durationMs by stepMs).zipWithIndex.map { case (off, i) =>
      Frame(i, off, md5hex(s"$base:$i".getBytes("UTF-8")))
    }
  }

  /** STUB audio featurizer: treats bytes as signed 8-bit samples — real
    * arithmetic over fake samples, deterministic for a given blob.
    */
  def audioFeaturesStub(audio: Array[Byte]): AudioFeatures = {
    if (audio == null || audio.isEmpty) return AudioFeatures(0L, 0.0, 0.0, null)
    var sum = 0.0
    var sumSq = 0.0
    var i = 0
    while (i < audio.length) {
      val v = audio(i).toDouble
      sum += v
      sumSq += v * v
      i += 1
    }
    AudioFeatures(
      audio.length.toLong, sum / audio.length,
      math.sqrt(sumSq / audio.length), md5hex(audio))
  }

  final case class WavFeatures(
      n_frames: Long, channels: Int, sample_rate: Int, duration_ms: Long,
      rms_blocks: Seq[Double], rms: Double, decoder: String)

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Synthesize a PCM16 little-endian WAV in memory: `nFrames` frames of
    * `channels` interleaved samples where the k-th SAMPLE (global
    * interleaved index) is the integer recurrence
    * `((seed * 31 + k * 7) % 2003) - 1001` — chosen so a SQL engine can
    * recompute every sample analytically (the q_image_ahash fixture
    * treatment for the audio modality). Encoded through the real
    * javax.sound writer, not a hand-rolled header.
    */
  def wavSynth(seed: Long, nFrames: Int, channels: Int, sampleRate: Int): Array[Byte] = {
    require(nFrames > 0 && channels > 0 && sampleRate > 0)
    val n = nFrames * channels
    val pcm = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val v = ((seed * 31 + k.toLong * 7) % 2003 - 1001).toInt
      pcm(2 * k) = (v & 0xff).toByte
      pcm(2 * k + 1) = ((v >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false) // signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Synthesize a PCM16 WAV like [[wavSynth]] but from the QUADRATIC
    * recurrence `v_k = ((j·j·7 + j·11) % 2003) - 1001` with
    * `j = seed·131 + k` — each seed is a different WINDOW into the same
    * quadratic sequence mod a prime, so equal seeds are byte-identical
    * while different seeds decorrelate (the window difference
    * `f(j+δ) − f(j)` is itself linear in `j` mod 2003, a chirp — binned
    * sums of two windows land at cosine ≲ 0.65 on the 199-class
    * fixture, measured, vs exactly 1 within a class). [[wavSynth]]'s
    * arithmetic progression cannot serve here: its seed is an additive
    * offset, and two offsets close mod 2003 give near-parallel binned
    * sums (measured 0.9997) — the audio sibling of
    * [[quadPatternPng]]'s id-class structure needs the quadratic.
    */
  def wavSynthQuad(seed: Long, nFrames: Int, channels: Int, sampleRate: Int): Array[Byte] = {
    require(nFrames > 0 && channels > 0 && sampleRate > 0)
    val n = nFrames * channels
    val pcm = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val j = seed * 131 + k
      val v = ((j * j * 7 + j * 11) % 2003 - 1001).toInt
      pcm(2 * k) = (v & 0xff).toByte
      pcm(2 * k + 1) = ((v >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Per-bin SIGNED sample sums — the audio sibling of
    * [[graft.ocr.ImageOps.blockSums]]: decode `bytes` as a PCM16 WAV via
    * the REAL `javax.sound.sampled` reader (the [[audioFeatures]] path),
    * split the interleaved sample stream into `bins` contiguous index
    * ranges (`bin = k·bins/n`, integer division — channels mix down by
    * interleaving, the coarse-envelope treatment), and return each bin's
    * exact integer sample sum: a waveform-envelope feature whose
    * DIRECTION survives amplitude scaling under the downstream L2
    * normalization. Exact 64-bit integer arithmetic throughout, so any
    * engine recomputing the same samples replays every bin bit-for-bit.
    * Returns null when the bytes are not a decodable 16-bit PCM WAV
    * (callers map it to a NULL embedding — the [[graft.ops.MlOps.imageEmbed]]
    * undecodable contract).
    */
  def sampleBinSums(bytes: Array[Byte], bins: Int): Array[Long] = {
    require(bins > 0, s"bins must be > 0, got $bins")
    if (bytes == null || bytes.isEmpty) return null
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return null
      val bigEndian = fmt.isBigEndian
      val data = ais.readAllBytes()
      val n = data.length / 2
      if (n == 0) return null
      val out = new Array[Long](bins)
      var k = 0
      while (k < n) {
        val lo = data(2 * k) & 0xff
        val hi = data(2 * k + 1) & 0xff
        val v = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toLong
        out((k.toLong * bins / n).toInt) += v
        k += 1
      }
      out
    } catch {
      case _: Exception => null
    }
  }

  /** REAL audio featurizer: decode `bytes` as a WAV via
    * `javax.sound.sampled` (PCM signed 16-bit) and report frame count,
    * channel count, sample rate, integer duration, per-block RMS over
    * `blockFrames`-frame windows (all channels interleaved in a block),
    * and whole-clip RMS. Sum-of-squares is exact 64-bit integer
    * arithmetic, then ONE sqrt + the portable round6 — bit-identical
    * across engines recomputing the same samples.
    *
    * Bytes that are not a decodable 16-bit PCM WAV fall back to the
    * deterministic [[audioFeaturesStub]] shape (`decoder = "stub"`,
    * mirroring [[Tess4JOcr.AutoFactory]]'s never-throw discipline): the
    * row keeps flowing with the error visible in the decoder column.
    */
  def audioFeatures(bytes: Array[Byte], blockFrames: Int): WavFeatures = {
    require(blockFrames > 0, s"blockFrames must be > 0, got $blockFrames")
    def stubbed: WavFeatures = {
      val s = audioFeaturesStub(bytes)
      WavFeatures(s.n_samples, 1, 0, 0L, Seq.empty, round6(s.rms), "stub")
    }
    if (bytes == null || bytes.isEmpty) return stubbed
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return stubbed
      val ch = fmt.getChannels
      val bigEndian = fmt.isBigEndian
      val data = ais.readAllBytes()
      val n = data.length / 2
      val nFrames = n / ch
      if (nFrames == 0) return stubbed
      val blockSamples = blockFrames * ch
      val nBlocks = (n + blockSamples - 1) / blockSamples
      val ss = new Array[Long](nBlocks)
      val cnt = new Array[Long](nBlocks)
      var total = 0L
      var k = 0
      while (k < n) {
        val lo = data(2 * k) & 0xff
        val hi = data(2 * k + 1) & 0xff
        val v = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toLong
        val b = k / blockSamples
        ss(b) += v * v
        cnt(b) += 1
        total += v * v
        k += 1
      }
      val rate = fmt.getSampleRate.toInt
      WavFeatures(
        nFrames.toLong, ch, rate,
        nFrames.toLong * 1000L / rate,
        (0 until nBlocks).map(b => round6(math.sqrt(ss(b).toDouble / cnt(b)))),
        round6(math.sqrt(total.toDouble / n)),
        "wav")
    } catch {
      case _: Exception => stubbed
    }
  }

  /** Render the 16×8 quadratic-pattern PNG for `id` — the shared image
    * fixture behind `q_image_neardup` / `q_image_embed` /
    * `q_image_semdedup`: pixel (x,y) is the gray value
    * `((x² + 3y² + xy(1 + id%256))·41 + id·31) % 256`, with a +8
    * perturbation of pixel (0,0) for ids ≥ 256. The pattern repeats
    * with period 256 in `id` (id·31 mod 256 depends only on id mod
    * 256), so (id, id+256, id+512, …) are NEAR-duplicate images — the
    * first class member below 256 differs in exactly one pixel, later
    * members are byte-identical — while distinct id%256 classes are
    * pseudo-random and far apart. Encoded as RGB (not TYPE_BYTE_GRAY):
    * Java's getRGB on a gray image applies a gray→sRGB conversion that
    * shifts pixel values; an RGB PNG with r=g=b=p round-trips
    * losslessly and Go-parity luma(p,p,p) == p exactly, so the decode →
    * grayscale path recovers the analytic formula bit-for-bit and the
    * DuckDB oracle replays it with no image code.
    */
  def quadPatternPng(id: Long): Array[Byte] = {
    val img = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 16) {
        var p = (((x * x + 3 * y * y + x * y * (1 + id % 256)) * 41
          + id * 31) % 256).toInt
        if (id >= 256 && x == 0 && y == 0) p = (p + 8) % 256
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Render a white PNG of the given size (fixture generator for the
    * multimodal queries — content is irrelevant, dims/schema are what the
    * oracle checks).
    */
  def whitePng(width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, width, height)
    g.dispose()
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }
}
