package graft.ocr

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OcrPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def files(rows: (String, Array[Byte])*) =
    rows.toDF("path", "content")

  private val png = ImageOps.blankPng()

  test("valid png with embedded text -> text + count (tiny_text fixture)") {
    val out = OcrPipeline.run(files(
      "a.png" -> StubOcr.embed(png, "HELLO WORLD"))).collect().head
    assert(out.getAs[String]("text") == "HELLO WORLD")
    assert(out.getAs[Long]("text_count") == 2L)
    assert(out.getAs[String]("error") == null)
  }

  test("wrong extension rejected with reference error string (main.go:78)") {
    val out = OcrPipeline.run(files("a.gif" -> png)).collect().head
    assert(out.getAs[String]("error") == "Invalid file format")
    assert(out.getAs[String]("text") == null)
  }

  test("garbage bytes with .png name -> decode error, row kept (main.go:83)") {
    val out = OcrPipeline.run(files(
      "junk.png" -> Array.fill[Byte](64)(7))).collect().head
    assert(out.getAs[String]("error") != null)
    assert(out.getAs[String]("error") != "Invalid file format")
  }

  test("oversize content filtered by the 10 MB cap (main.go:43)") {
    val big = new Array[Byte](OcrPipeline.MaxBytes.toInt + 1)
    System.arraycopy(png, 0, big, 0, png.length)
    val out = OcrPipeline.run(files("big.png" -> big)).collect().head
    assert(out.getAs[String]("error") != null)
    assert(out.getAs[String]("error").contains("exceeds"))
  }

  test("word count parity with Go strings.Fields (FIXTURES corpus)") {
    assert(OcrPipeline.fieldsCount("") == 0)
    assert(OcrPipeline.fieldsCount("a") == 1)
    assert(OcrPipeline.fieldsCount(" a  b\t c\n") == 3)
    assert(OcrPipeline.fieldsCount("a b") == 2) // NBSP IS whitespace in Go
    assert(OcrPipeline.fieldsCount("多 词 计数") == 3)
    assert(OcrPipeline.fieldsCount(Seq.fill(10000)("w").mkString(" ")) == 10000)
  }

  test("json sink matches the reference's serialized shape (main.go:216-219)") {
    val js = OcrPipeline.toJsonResults(
      OcrPipeline.run(files("a.png" -> StubOcr.embed(png, "x y z"))))
      .select("json").as[String].collect().head
    assert(js == """{"text":"x y z","textCount":3}""")
  }

  test("binaryFile source feeds the pipeline (R1)") {
    val dir = Files.createTempDirectory("graft_bin").toFile
    Files.write(new java.io.File(dir, "d1.png").toPath, StubOcr.embed(png, "from disk"))
    Files.write(new java.io.File(dir, "d2.gif").toPath, png)
    val src = spark.read.format("binaryFile").load(dir.getAbsolutePath)
    val out = OcrPipeline.run(src).orderBy("path").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("text") == "from disk")
    assert(out(1).getAs[String]("error") == "Invalid file format")
  }

  test("pipeline errors never drop rows: 4 mixed inputs -> 4 outputs") {
    val out = OcrPipeline.run(files(
      "ok.png" -> StubOcr.embed(png, "fine"),
      "bad.gif" -> png,
      "junk.jpeg" -> Array.fill[Byte](10)(1),
      "no_text.png" -> png))
    assert(out.count() == 4)
    assert(out.filter(col("error").isNull).count() == 2) // ok.png + no_text.png
  }

  test("server status literal frame (R11, main.go:29-39)") {
    val st = OcrPipeline.serverStatus(spark, "host1").collect().head
    assert(st.getString(0) == "host1" && st.getString(1) == "Running....")
  }
}
