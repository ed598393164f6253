package graft

/** Sweeping plan-shape guard over the entire registered surface: no query
  * may plan an unintended CartesianProduct (the operators that genuinely
  * want cross/theta semantics are allowlisted and must broadcast instead).
  */
class PlanHygieneSpec extends SparkSpec {

  // queries whose semantics are inherently cross/non-equi; they must still
  // avoid CartesianProduct by broadcasting the small side
  private val nonEqui = Set(
    "q_join_cross", "q_join_theta", "q_embedding_neardup",
    "q_similarity_topk", "q_ann_lsh", "q_ann_ivf", "q_fuzzy_join",
    "q_ngram_jaccard", "q_join_range")

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
