package graft.ocr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship path (R1-R10, `/root/reference/main.go:41-97`)
  * as one narrow Spark pipeline:
  *
  *   binary rows → format dispatch → size cap → fused
  *   decode+grayscale+binarize (single UDF, one binary round-trip instead
  *   of the reference's three disk spools) → per-partition OCR backend →
  *   Unicode word count → JSON-ready result.
  *
  * Errors ride an `error` column (the reference's 400/500 `http.Error`
  * sites, `main.go:45-91`) — a failed row never kills the job and is never
  * silently dropped.
  *
  * Scale posture: the whole pipeline is per-row narrow work — no shuffle,
  * mirrors the reference's embarrassingly-parallel replica scaling (R14).
  * Call `repartition(n)` upstream to size OCR parallelism, exactly like
  * `--scale api=10` sized the reference deployment.
  */
object OcrPipeline {

  val MaxBytes: Long = 10L * 1024 * 1024 // main.go:43 (10 MB cap)
  val ValidExts = Set("png", "jpg", "jpeg") // main.go:75
  val InvalidFormatError = "Invalid file format" // main.go:78

  final case class Pre(
      path: String, image: Array[Byte], width: Int, height: Int, error: String)
  final case class Out(
      path: String, text: String, text_count: Long,
      width: Int, height: Int, error: String)

  /** Locate a stub-annotation trailer (bytes past the encoded image). */
  private def trailerStart(bytes: Array[Byte]): Int = {
    val magic = StubOcr.Magic
    var i = 0
    while (i <= bytes.length - magic.length) {
      var j = 0
      while (j < magic.length && bytes(i + j) == magic(j)) j += 1
      if (j == magic.length) return i
      i += 1
    }
    -1
  }

  /** Fused decode → grayscale → binarize → PNG re-encode (SURVEY.md §7.3:
    * one UDF, not three, to avoid triple binary serialization). Trailing
    * annotation bytes survive preprocessing the way the reference's
    * tesseract stage reads the *preprocessed* temp file (`main.go:110-117`).
    */
  def preprocess(path: String, content: Array[Byte]): Pre = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    if (!ValidExts.contains(ext))
      Pre(path, null, -1, -1, InvalidFormatError)
    else if (content.length > MaxBytes)
      Pre(path, null, -1, -1, s"file exceeds ${MaxBytes} bytes")
    else
      ImageOps.decode(content) match {
        case Left(err) => Pre(path, null, -1, -1, err)
        case Right(img) =>
          val mask = ImageOps.binarize(ImageOps.grayscale(img))
          val encoded = ImageOps.encodePng(mask)
          val t = trailerStart(content)
          val withTrailer =
            if (t < 0) encoded
            else encoded ++ java.util.Arrays.copyOfRange(content, t, content.length)
          Pre(path, withTrailer, mask.width, mask.height, null)
      }
  }

  /** Go strings.Fields parity (main.go:195): split on Unicode-whitespace
    * runs, drop empties. Uses the same class as TextOps.WsRe.
    */
  def fieldsCount(s: String): Long =
    if (s == null || s.isEmpty) 0L
    else s.split(graft.ops.TextOps.WsRe).count(_.nonEmpty).toLong

  /** Full pipeline over (path STRING, content BINARY) rows — the shape of
    * `spark.read.format("binaryFile")`. One OCR backend per partition
    * (the reference paid a client per request, `main.go:100-101`).
    */
  def run(files: DataFrame, factory: OcrBackendFactory = StubOcr.Factory): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // preprocess + OCR share the partition iterator; backend built once
        val backend = factory.create()
        it.map { case (path, content) =>
          val pre = preprocess(path, content)
          if (pre.error != null)
            Out(pre.path, null, 0L, pre.width, pre.height, pre.error)
          else
            backend.extract(pre.image) match {
              case Left(err) => Out(pre.path, null, 0L, pre.width, pre.height, err)
              case Right(text) =>
                Out(pre.path, text, fieldsCount(text), pre.width, pre.height, null)
            }
        }
      }
      .toDF()
  }

  /** JSON serialize sink (R10): `{"text":…,"textCount":…}` exactly as
    * `main.go:216-219`'s struct tags emit.
    */
  def toJsonResults(results: DataFrame): DataFrame =
    results.select(
      col("path"),
      to_json(struct(
        col("text"),
        col("text_count").cast("int").as("textCount"))).as("json"))

  /** Status source (R11, `main.go:29-39`): one-row literal frame. */
  def serverStatus(spark: SparkSession, host: String): DataFrame = {
    import spark.implicits._
    Seq((host, "Running....")).toDF("host", "status")
  }
}
