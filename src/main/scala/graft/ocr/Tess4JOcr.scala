package graft.ocr

import java.awt.image.BufferedImage

/** Real OCR backend (R8) behind reflection: when Tess4J and a native
  * libtesseract are on the classpath/library path, this drives them with
  * the reference's exact configuration — lang="eng" and PSM_AUTO_OSD
  * (`/root/reference/main.go:118-119`). When they are absent (this build
  * environment ships neither, and the build may add no dependencies —
  * SURVEY.md §7.4), [[Tess4JOcr.AutoFactory]] falls back to the
  * deterministic [[StubOcr]], which stays the CI default.
  *
  * Reflection keeps the compile-time dependency surface at zero: the
  * class loads and runs against whatever `net.sourceforge.tess4j` the
  * deployment provides, and `available` is probed once per JVM.
  */
object Tess4JOcr {

  val TesseractClass = "net.sourceforge.tess4j.Tesseract"

  /** PSM_AUTO_OSD — automatic segmentation with orientation+script
    * detection, the mode the reference sets (`main.go:119`).
    */
  val PsmAutoOsd = 1

  /** Probed once per JVM (executors probe independently). */
  lazy val available: Boolean =
    try { Class.forName(TesseractClass); true }
    catch { case _: Throwable => false }

  final class Backend extends OcrBackend {
    val name = "tess4j"

    private val cls = Class.forName(TesseractClass)
    private val instance = {
      val o = cls.getDeclaredConstructor().newInstance()
      cls.getMethod("setLanguage", classOf[String])
        .invoke(o, "eng") // main.go:118
      cls.getMethod("setPageSegMode", classOf[Int])
        .invoke(o, Int.box(PsmAutoOsd)) // main.go:119
      o
    }
    private val doOcr = cls.getMethod("doOCR", classOf[BufferedImage])

    /** Never throws — a failed row lands in the pipeline's error column.
      * Catches Throwable, not just Exception: a half-provisioned host
      * (tess4j jar present, native libtesseract absent) surfaces as
      * UnsatisfiedLinkError/NoClassDefFoundError at doOCR time, and an
      * Error-class escape inside mapPartitions would kill the job.
      */
    def extract(imageBytes: Array[Byte]): Either[String, String] =
      ImageOps.decode(imageBytes) match {
        case Left(err) => Left(err)
        case Right(img) =>
          try Right(doOcr.invoke(instance, img).asInstanceOf[String])
          catch {
            case e: java.lang.reflect.InvocationTargetException =>
              Left(s"ocr failed: ${Option(e.getCause).getOrElse(e).getMessage}")
            case e: Throwable => Left(s"ocr failed: ${e.getMessage}")
          }
      }
  }

  /** Tess4J when present, stub otherwise — resolved on the EXECUTOR (one
    * backend per partition, as OcrPipeline.run constructs them), so a
    * cluster where only workers carry the native lib still works.
    * Backend CONSTRUCTION can itself throw linkage Errors on a
    * half-provisioned host (jar without native lib); that also falls
    * back to the stub rather than killing the partition.
    */
  object AutoFactory extends OcrBackendFactory {
    def create(): OcrBackend =
      if (!available) new StubOcr.Backend
      else
        try new Backend
        catch { case _: Throwable => new StubOcr.Backend }
  }
}
