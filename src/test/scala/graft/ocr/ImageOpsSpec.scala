package graft.ocr

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

class ImageOpsSpec extends AnyFunSuite {

  private def rampImage(): BufferedImage = {
    // 256x1 gray ramp: pixel x has r=g=b=x (FIXTURES.md gray_ramp.png)
    val img = new BufferedImage(256, 1, BufferedImage.TYPE_INT_RGB)
    (0 until 256).foreach(x => img.setRGB(x, 0, (x << 16) | (x << 8) | x))
    img
  }

  test("binarize threshold 128: 127 -> black, 128 -> white (main.go:181-185)") {
    val g = ImageOps.grayscale(rampImage())
    val b = ImageOps.binarize(g)
    // luma(x,x,x) == x for gray input, so ramp position == gray level
    assert((b.pixels(127) & 0xff) == 0)
    assert((b.pixels(128) & 0xff) == 255)
    assert(b.pixels.forall(p => (p & 0xff) == 0 || (p & 0xff) == 255))
  }

  test("luma matches Go color.GrayModel on gray input (identity)") {
    (0 until 256).foreach(v => assert(ImageOps.luma(v, v, v) == v))
  }

  test("luma known values (ITU-R 601 weights)") {
    assert(ImageOps.luma(255, 0, 0) == 76)  // 0.299 * 255 = 76.2
    assert(ImageOps.luma(0, 255, 0) == 150) // 0.587 * 255 = 149.7
    assert(ImageOps.luma(0, 0, 255) == 29)  // 0.114 * 255 = 29.07
    assert(ImageOps.luma(255, 255, 255) == 255)
    assert(ImageOps.luma(0, 0, 0) == 0)
  }

  test("grayscale is bounds-safe on non-zero-origin subimages (ref bug main.go:132-133)") {
    val img = rampImage()
    val sub = img.getSubimage(100, 0, 50, 1) // Raster origin no longer (0,0)
    val g = ImageOps.grayscale(sub)
    assert(g.width == 50 && g.height == 1)
    assert((g.pixels(0) & 0xff) == 100)
    assert((g.pixels(49) & 0xff) == 149)
  }

  test("decode rejects garbage without throwing (500 path main.go:83)") {
    val r = ImageOps.decode(Array.fill[Byte](64)(42))
    assert(r.isLeft)
  }

  test("PNG roundtrip preserves the mask") {
    val g = ImageOps.binarize(ImageOps.grayscale(rampImage()))
    val png = ImageOps.encodePng(g)
    val back = ImageOps.grayscale(ImageOps.decode(png).toOption.get)
    assert(back.pixels.toSeq == g.pixels.toSeq)
  }

  test("real resize produces requested dims") {
    val png = MultimodalOps.whitePng(32, 16)
    val small = MultimodalOps.resize(png, 8, 4)
    val meta = MultimodalOps.imageMeta(small)
    assert(meta.width == 8 && meta.height == 4 && meta.valid)
  }

  test("imageMeta sniffs format from magic bytes, not extension") {
    val meta = MultimodalOps.imageMeta(MultimodalOps.whitePng(10, 7))
    assert(meta.format == "png" && meta.width == 10 && meta.height == 7)
    assert(!MultimodalOps.imageMeta(Array.fill[Byte](16)(1)).valid)
  }

  test("stub frame sampler is deterministic and fps-spaced") {
    val video = Array.tabulate[Byte](100)(_.toByte)
    val f1 = MultimodalOps.sampleFramesStub(video, 1000, 10.0)
    val f2 = MultimodalOps.sampleFramesStub(video, 1000, 10.0)
    assert(f1 == f2)
    assert(f1.size == 10)
    assert(f1.map(_.offset_ms) == (0L until 1000L by 100L).toSeq)
  }

  test("stub audio features: real arithmetic, deterministic clip id") {
    val a = MultimodalOps.audioFeaturesStub(Array[Byte](3, -3, 3, -3))
    assert(a.n_samples == 4 && a.mean_amplitude == 0.0 && a.rms == 3.0)
    assert(a.clip_id != null)
  }

  test("real WAV decode: committed fixture yields its analytic features") {
    // fixtures/tone.wav: 8000 Hz mono PCM16, 800 frames of a ±1000
    // square wave (period 8) — RMS is EXACTLY 1000.0 by construction,
    // duration 100 ms, two 400-frame blocks each also RMS 1000.
    val in = getClass.getResourceAsStream("/fixtures/tone.wav")
    assert(in != null, "missing test fixture /fixtures/tone.wav")
    val bytes = in.readAllBytes(); in.close()
    val f = MultimodalOps.audioFeatures(bytes, 400)
    assert(f.decoder == "wav", "fixture must take the REAL decode path")
    assert(f.n_frames == 800L && f.channels == 1 && f.sample_rate == 8000)
    assert(f.duration_ms == 100L)
    assert(f.rms == 1000.0 && f.rms_blocks == Seq(1000.0, 1000.0))
  }

  test("real WAV decode: synth roundtrip matches the sample recurrence; stub fallback") {
    // wavSynth(seed, …) encodes sample k = ((seed*31 + k*7) % 2003) - 1001
    // through the real javax.sound writer; the real reader must hand the
    // exact integers back (stereo: interleaved frames, 2 frames' worth
    // per 400-frame block boundary handled by integer-floor identity).
    val seed = 42L
    val wav = MultimodalOps.wavSynth(seed, nFrames = 500, channels = 2, sampleRate = 8000)
    val f = MultimodalOps.audioFeatures(wav, 400)
    assert(f.decoder == "wav" && f.n_frames == 500L && f.channels == 2)
    assert(f.sample_rate == 8000 && f.duration_ms == 62L) // 500*1000/8000 floor
    def s(k: Int): Long = (seed * 31 + k.toLong * 7) % 2003 - 1001
    def rmsOf(ks: Range): Double = {
      val ss = ks.map(k => s(k) * s(k)).sum
      math.floor(math.sqrt(ss.toDouble / ks.size) * 1e6 + 0.5) / 1e6
    }
    assert(f.rms_blocks == Seq(rmsOf(0 until 800), rmsOf(800 until 1000)))
    assert(f.rms == rmsOf(0 until 1000))
    // non-WAV bytes: never throw, fall back to the stub shape with the
    // failure visible in the decoder column (the AutoFactory discipline)
    val junk = MultimodalOps.audioFeatures(Array[Byte](3, -3, 3, -3), 400)
    assert(junk.decoder == "stub" && junk.n_frames == 4L && junk.rms == 3.0)
    assert(MultimodalOps.audioFeatures(null, 400).decoder == "stub")
  }

  test("aHash: hand-computed hash, edit locality, grid divisibility") {
    // 8x8 identity grid (1 pixel per block): left half 0, right half 255
    // -> each row's bits are 00001111 -> nibbles "0f" x 8
    val half = ImageOps.Gray(8, 8,
      Array.tabulate(64)(i => if (i % 8 < 4) 0.toByte else 255.toByte))
    assert(ImageOps.aHash(half) == "0f" * 8)
    // uniform image: no block exceeds the global mean (strict >) -> all 0
    val flat = ImageOps.Gray(8, 8, Array.fill(64)(7.toByte))
    assert(ImageOps.aHash(flat) == "0" * 16)
    // perceptual locality: flipping one pixel changes few bits
    val tweaked = half.pixels.clone()
    tweaked(0) = 255.toByte
    val d = ImageOps.aHash(half).zip(
      ImageOps.aHash(ImageOps.Gray(8, 8, tweaked)))
      .map { case (a, b) =>
        Integer.bitCount(Character.digit(a, 16) ^ Character.digit(b, 16))
      }.sum
    assert(d <= 2, s"one-pixel edit moved $d bits")
    intercept[IllegalArgumentException] {
      ImageOps.aHash(ImageOps.Gray(10, 6, new Array[Byte](60)))
    }
  }
}
