package graft.ocr

import org.scalatest.funsuite.AnyFunSuite

/** R12 parity: header set and preflight rule must match
  * `/root/reference/main.go:199-214` exactly.
  */
class ServingShimSpec extends AnyFunSuite {

  test("CORS headers are byte-for-byte the reference's, in order") {
    assert(ServingShim.CorsHeaders == Seq(
      "Access-Control-Allow-Origin" -> "*",
      "Access-Control-Allow-Methods" -> "POST, GET, OPTIONS, PUT, DELETE",
      "Access-Control-Allow-Headers" -> "Content-Type, Authorization"))
  }

  test("OPTIONS preflight short-circuits; other methods run the pipeline") {
    assert(!ServingShim.decide("OPTIONS")._2)
    assert(!ServingShim.decide("options")._2) // Go matches the constant, but
    // a gateway normalizes case; the shim accepts either spelling
    assert(ServingShim.decide("POST")._2)
    assert(ServingShim.decide("GET")._2)
    // null method (malformed request): never short-circuit silently
    assert(ServingShim.decide(null)._2)
  }

  test("every response carries the headers regardless of method") {
    Seq("GET", "POST", "OPTIONS").foreach { m =>
      assert(ServingShim.decide(m)._1 == ServingShim.CorsHeaders)
    }
  }

  test("policy DataFrame exposes the three headers") {
    val rows = ServingShim.corsPolicy(graft.TestSpark.spark)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(rows == ServingShim.CorsHeaders)
  }
}
