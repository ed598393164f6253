package graft.ocr

import org.scalatest.funsuite.AnyFunSuite

/** The real-OCR path is environment-gated: this container ships no Tess4J
  * jar and no native libtesseract, so the real-engine test self-skips via
  * `assume` and only the wiring (probe + fallback) is asserted here. On a
  * deployment with Tess4J present, the gated test runs the real engine.
  */
class Tess4JOcrSpec extends AnyFunSuite {

  test("AutoFactory falls back to the stub when Tess4J is absent") {
    val backend = Tess4JOcr.AutoFactory.create()
    if (Tess4JOcr.available) assert(backend.name == "tess4j")
    else assert(backend.name == "stub")
  }

  test("stub fallback still reads embedded fixture text") {
    assume(!Tess4JOcr.available)
    val png = StubOcr.embed(ImageOps.blankPng(16, 8), "hello graft")
    assert(Tess4JOcr.AutoFactory.create().extract(png) == Right("hello graft"))
  }

  test("real Tesseract extracts text when the native engine is present") {
    assume(Tess4JOcr.available)
    val backend = Tess4JOcr.AutoFactory.create()
    assert(backend.name == "tess4j")
    // plain blank image: real OCR of nothing must yield no words, not fail
    val out = backend.extract(ImageOps.blankPng(64, 32))
    assert(out.isRight)
  }
}
