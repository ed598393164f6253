package graft.ocr

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Pure-JVM image kernels mirroring the reference pipeline
  * (`/root/reference/main.go:124-190`), with its two bugs fixed and its
  * memory blow-up avoided:
  *
  *  - grayscale uses Go's `color.GrayModel` luma exactly
  *    (19595·r + 38470·g + 7471·b + 2^15 >> 24 over 16-bit channels,
  *    the conversion behind `img.Set` at `main.go:134`), but iterates
  *    bounds-safely (the reference ignores `Rect.Min`, `main.go:132-133`);
  *  - binarize keeps the fixed threshold 128 (`main.go:173`): gray < 128 →
  *    black(0) else white(255), per `main.go:181-185`, but emits a 1-byte
  *    mask instead of the reference's 4-byte NRGBA (`main.go:175`);
  *  - both PNG and JPEG decode work (the reference accepts `.jpg` at
  *    `main.go:75` but never registers a jpeg decoder — documented
  *    divergence, SURVEY.md §2A R4).
  *
  * All functions are static and Serializable-safe for use inside UDFs /
  * mapPartitions; images never round-trip through disk (the reference
  * spools three times per request, `main.go:59-66,110-117`).
  */
object ImageOps {

  final case class Gray(width: Int, height: Int, pixels: Array[Byte])

  /** Decode PNG/JPEG bytes. Returns Left(error) instead of throwing so a
    * bad row lands in the pipeline's error column (maps the 500 path at
    * `main.go:83`), never kills a task.
    */
  def decode(bytes: Array[Byte]): Either[String, BufferedImage] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Left("undecodable image") else Right(img)
    } catch {
      case e: Exception => Left(s"decode failed: ${e.getMessage}")
    }

  /** Go color.GrayModel parity: 8-bit channel -> 16-bit (c * 0x101),
    * y16 = (19595 r + 38470 g + 7471 b + 32768) >> 16, stored y = y16 >> 8.
    */
  def luma(r: Int, g: Int, b: Int): Int = {
    val r16 = r * 0x101
    val g16 = g * 0x101
    val b16 = b * 0x101
    val y16 = (19595L * r16 + 38470L * g16 + 7471L * b16 + (1L << 15)) >> 16
    (y16 >> 8).toInt
  }

  /** Grayscale projection (R5), bounds-safe. */
  def grayscale(img: BufferedImage): Gray = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        out(y * w + x) =
          luma((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Gray(w, h, out)
  }

  /** Fixed-threshold binarize (R6): gray < 128 -> 0 (black) else 255. */
  def binarize(g: Gray, threshold: Int = 128): Gray = {
    val out = new Array[Byte](g.pixels.length)
    var i = 0
    while (i < g.pixels.length) {
      out(i) = if ((g.pixels(i) & 0xff) < threshold) 0.toByte else 255.toByte
      i += 1
    }
    Gray(g.width, g.height, out)
  }

  /** PNG-encode a gray mask in memory (R7 without the disk round-trip). */
  def encodePng(g: Gray): Array[Byte] = {
    val img = new BufferedImage(g.width, g.height, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, g.width, g.height, g.pixels)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Perceptual average-hash (aHash) over an `hGrid`×`wGrid` block grid:
    * bit (j,i) is 1 when block (j,i)'s mean exceeds the global mean.
    * Integer-exact — the comparison is cross-multiplied
    * (`blockSum * totalPixels > totalSum * blockPixels`), so the hash is
    * bit-for-bit reproducible by any engine that can sum the pixels
    * (the DuckDB oracle recomputes it analytically). Bits are packed
    * MSB-first, row-major, as 16 lowercase hex chars — the same layout
    * as SimHash64. Requires width/height divisible by the grid.
    */
  def aHash(g: Gray, wGrid: Int = 8, hGrid: Int = 8): String = {
    require(g.width % wGrid == 0 && g.height % hGrid == 0,
      s"image ${g.width}x${g.height} not divisible by ${wGrid}x$hGrid grid")
    val bw = g.width / wGrid
    val bh = g.height / hGrid
    val blockPixels = bw * bh
    val totalPixels = g.width * g.height
    var totalSum = 0L
    var idx = 0
    while (idx < g.pixels.length) {
      totalSum += g.pixels(idx) & 0xff
      idx += 1
    }
    val nibbles = new Array[Int](16)
    var j = 0
    while (j < hGrid) {
      var i = 0
      while (i < wGrid) {
        var bs = 0L
        var y = j * bh
        while (y < (j + 1) * bh) {
          var x = i * bw
          while (x < (i + 1) * bw) {
            bs += g.pixels(y * g.width + x) & 0xff
            x += 1
          }
          y += 1
        }
        if (bs * totalPixels > totalSum * blockPixels) {
          val k = j * wGrid + i
          nibbles(k / 4) |= 1 << (3 - k % 4)
        }
        i += 1
      }
      j += 1
    }
    nibbles.map("0123456789abcdef".charAt(_)).mkString
  }

  /** Block-intensity sums over an `hGrid`×`wGrid` grid — the integer
    * feature vector behind [[graft.ops.MlOps.imageEmbed]]: entry
    * `j * wGrid + i` (row-major, the [[aHash]] bit layout) is the exact
    * sum of block (j,i)'s gray pixels. Integer-exact by construction,
    * so any engine that can sum the pixels reproduces it bit-for-bit
    * (the DuckDB oracle recomputes it analytically). Requires
    * width/height divisible by the grid — same contract as [[aHash]].
    * Overflow headroom: a long holds Σblock² for any block under
    * ~6·10⁹ pixels (255·n ≤ 3·10⁹ per block), far past any real image;
    * the caller's ANSI Σs² norm guard catches the pathological case
    * loudly.
    */
  def blockSums(g: Gray, wGrid: Int = 8, hGrid: Int = 8): Array[Long] = {
    require(g.width % wGrid == 0 && g.height % hGrid == 0,
      s"image ${g.width}x${g.height} not divisible by ${wGrid}x$hGrid grid")
    val bw = g.width / wGrid
    val bh = g.height / hGrid
    val out = new Array[Long](wGrid * hGrid)
    var j = 0
    while (j < hGrid) {
      var i = 0
      while (i < wGrid) {
        var bs = 0L
        var y = j * bh
        while (y < (j + 1) * bh) {
          var x = i * bw
          while (x < (i + 1) * bw) {
            bs += g.pixels(y * g.width + x) & 0xff
            x += 1
          }
          y += 1
        }
        out(j * wGrid + i) = bs
        i += 1
      }
      j += 1
    }
    out
  }

  private def blank(width: Int, height: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val gfx = img.createGraphics()
    gfx.setColor(java.awt.Color.WHITE)
    gfx.fillRect(0, 0, width, height)
    gfx.dispose()
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  /** Render a tiny valid PNG (test/fixture helper). */
  def blankPng(width: Int = 16, height: Int = 8): Array[Byte] =
    blank(width, height, "png")

  /** Render a tiny valid JPEG (fixture for the jpeg decode branch — the
    * path the reference advertises but cannot serve: `.jpg` accepted at
    * `main.go:75`, yet no `image/jpeg` import registers a decoder, so
    * every real JPEG 500s there. Here it must decode for real.)
    */
  def blankJpeg(width: Int = 16, height: Int = 8): Array[Byte] =
    blank(width, height, "jpg")
}
