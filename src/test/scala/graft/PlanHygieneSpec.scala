package graft

/** Sweeping plan-shape guard over the entire registered surface: no query
  * may plan an unintended CartesianProduct (the operators that genuinely
  * want cross/theta semantics are allowlisted and must broadcast instead).
  */
class PlanHygieneSpec extends SparkSpec {

  // No allowlist: even the inherently cross/non-equi queries (theta,
  // similarity, fuzzy) must plan as broadcast joins, never cartesian.
  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.all.flatMap { q =>
      try {
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(q.name) else None
      } catch {
        case e: Throwable => Some(s"${q.name} (plan failed: ${e.getMessage.take(80)})")
      }
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
