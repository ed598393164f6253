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
  *  - video frame sampling and audio feature extraction are DETERMINISTIC
  *    STUBS (no codec libraries in the container — SURVEY.md §7.4): the
  *    Spark-side plumbing (schema, batch shape, per-partition execution)
  *    is real and tested, the codec call is a fixed fake keyed on content
  *    hash so results are reproducible.
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
