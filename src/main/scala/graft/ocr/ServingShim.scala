package graft.ocr

/** Serving-layer shim (R12, `/root/reference/main.go:199-214`): the
  * reference wraps its OCR route in a CORS middleware that (1) stamps
  * three fixed headers on every response and (2) short-circuits OPTIONS
  * preflights with an empty 200.
  *
  * The engine is a library, not an HTTP server, so this ships as the
  * policy + decision function an embedding gateway applies — the same
  * split the reference itself makes between `handleCORS` (policy) and
  * `handleOCR` (work). Header names/values and the preflight rule are
  * byte-for-byte the reference's.
  */
object ServingShim {

  /** Exactly the headers of `main.go:202-204`, in set order. */
  val CorsHeaders: Seq[(String, String)] = Seq(
    "Access-Control-Allow-Origin" -> "*",
    "Access-Control-Allow-Methods" -> "POST, GET, OPTIONS, PUT, DELETE",
    "Access-Control-Allow-Headers" -> "Content-Type, Authorization")

  /** Preflight rule of `main.go:207-209`: OPTIONS returns immediately
    * (headers only, no body, no downstream work).
    */
  def isPreflight(method: String): Boolean =
    method != null && method.equalsIgnoreCase("OPTIONS")

  /** Decide a request: headers to stamp plus whether to run the pipeline
    * (`false` = preflight short-circuit). One call per request in a
    * gateway; also usable as a literal DataFrame for introspection.
    */
  def decide(method: String): (Seq[(String, String)], Boolean) =
    (CorsHeaders, !isPreflight(method))

  /** The policy as a one-row-per-header DataFrame (engine-side view of
    * the serving config, mirroring how `serverStatus` exposes R11).
    */
  def corsPolicy(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    CorsHeaders.toDF("header", "value")
  }
}
