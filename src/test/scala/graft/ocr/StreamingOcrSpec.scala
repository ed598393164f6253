package graft.ocr

import java.nio.file.Files

import graft.SparkSpec

/** The reference's actual deployment shape: an unbounded stream of
  * uploaded images (`main.go:41-55`, one request = one record) → OCR →
  * JSON results. Here: binaryFile readStream → the SAME OcrPipeline.run
  * used in batch → memory sink.
  */
class StreamingOcrSpec extends SparkSpec {

  test("OCR pipeline runs unchanged under Structured Streaming file ingest") {
    val dir = Files.createTempDirectory("graft_stream_ocr").toFile
    val png = ImageOps.blankPng()
    Files.write(new java.io.File(dir, "a.png").toPath, StubOcr.embed(png, "stream one"))
    Files.write(new java.io.File(dir, "b.png").toPath, StubOcr.embed(png, "stream two words"))
    Files.write(new java.io.File(dir, "c.gif").toPath, png)

    val src = spark.readStream
      .format("binaryFile")
      .schema(spark.read.format("binaryFile").load(dir.getAbsolutePath).schema)
      .load(dir.getAbsolutePath)

    val q = OcrPipeline.run(src)
      .writeStream.format("memory").queryName("ocr_stream_out")
      .outputMode("append").start()
    q.processAllAvailable()

    // late-arriving upload — the stream picks it up incrementally
    Files.write(new java.io.File(dir, "d.png").toPath, StubOcr.embed(png, "late"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ocr_stream_out").orderBy("path").collect()
    assert(out.length == 4)
    val byName = out.map(r =>
      r.getAs[String]("path").split('/').last ->
        (r.getAs[String]("text"), r.getAs[Long]("text_count"), r.getAs[String]("error"))).toMap
    assert(byName("a.png") == (("stream one", 2L, null)))
    assert(byName("b.png") == (("stream two words", 3L, null)))
    assert(byName("c.gif")._3 == "Invalid file format")
    assert(byName("d.png") == (("late", 1L, null)))
  }
}
