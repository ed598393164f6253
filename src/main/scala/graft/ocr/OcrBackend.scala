package graft.ocr

import java.nio.charset.StandardCharsets

/** Pluggable OCR extraction (R8, `/root/reference/main.go:99-122`).
  *
  * The reference constructs a Tesseract client per HTTP request
  * (`main.go:100-101`); here a backend is constructed once per Spark
  * partition (see OcrPipeline) — the same amortization its authors should
  * have done. A real Tess4J/JNI backend would implement this trait when a
  * native libtesseract is present; this environment ships none (SURVEY.md
  * §7.4), so the default backend is a deterministic stub that the whole
  * pipeline and its tests run against.
  */
trait OcrBackend {
  def name: String

  /** Extract text from an encoded (PNG) image. Never throws. */
  def extract(imageBytes: Array[Byte]): Either[String, String]
}

/** Constructed per partition; must be serializable-free (a factory
  * function is shipped to executors, not the backend instance).
  */
trait OcrBackendFactory extends Serializable {
  def create(): OcrBackend
}

/** Deterministic stub: reads text embedded after the PNG IEND chunk behind
  * a magic marker. PNG decoders ignore trailing bytes, so fixtures made by
  * [[StubOcr.embed]] remain REAL decodable PNGs — decode / grayscale /
  * binarize run for real, and only the character-recognition step is
  * faked (lang="eng", PSM parity is meaningless without a native engine).
  */
object StubOcr {
  val Magic: Array[Byte] = "GRAFTTXT".getBytes(StandardCharsets.UTF_8)

  /** Append `text` to a valid PNG so the stub can "recognize" it. */
  def embed(png: Array[Byte], text: String): Array[Byte] =
    png ++ Magic ++ text.getBytes(StandardCharsets.UTF_8)

  private def indexOfMagic(bytes: Array[Byte]): Int = {
    var i = 0
    while (i <= bytes.length - Magic.length) {
      var j = 0
      while (j < Magic.length && bytes(i + j) == Magic(j)) j += 1
      if (j == Magic.length) return i
      i += 1
    }
    -1
  }

  final class Backend extends OcrBackend {
    val name = "stub"
    def extract(imageBytes: Array[Byte]): Either[String, String] = {
      val i = indexOfMagic(imageBytes)
      if (i < 0) Right("") // a real image with no embedded text -> no text
      else Right(new String(
        imageBytes, i + Magic.length, imageBytes.length - i - Magic.length,
        StandardCharsets.UTF_8))
    }
  }

  object Factory extends OcrBackendFactory {
    def create(): OcrBackend = new Backend
  }
}
