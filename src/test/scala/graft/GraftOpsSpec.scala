package graft

import org.apache.spark.sql.functions._

/** Facade behavior tests. The oracle gate already covers the facade's
  * main paths (the registered queries are built ON it); what's left for
  * specs is the parameter surface the fixtures never exercise —
  * excludeSelf=false, the stopword gate toggle, collision safety,
  * empty-input edges.
  */
class GraftOpsSpec extends SparkSpec {

  test("dedupExact keeps exactly the min-ordered row per key") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L, "x3"), ("a", 1L, "x1"), ("b", 2L, "y2"), ("a", 2L, "x2"))
      .toDF("k", "ord", "payload")
    val kept = GraftOps.dedupExact(df, "k", "ord")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(kept == Seq("a" -> 1L, "b" -> 2L))
  }

  test("cosineTopK excludeSelf=false scores a corpus row sharing a query id") {
    import spark.implicits._
    // corpus id 7 == query id 7 but DIFFERENT vectors (independent id
    // spaces): with excludeSelf=false the corpus row must be scored
    val corpus = Seq(
      (7L, Array(1f, 0f)), (8L, Array(0.9f, 0.1f)), (9L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((7L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val withSelf = GraftOps.cosineTopK(corpus, queries, 1, excludeSelf = false)
      .collect()
    assert(withSelf.length == 1 && withSelf.head.getAs[Long]("vid") == 7L)
    val without = GraftOps.cosineTopK(corpus, queries, 1)
      .collect()
    assert(without.length == 1 && without.head.getAs[Long]("vid") == 8L)
  }

  test("curate applies both gates, and the stopword gate can be disabled") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (2L, "too short", "en"),
      (3L, "foo bar baz qux quux corge grault garply waldo fred", "xx"))
      .toDF("doc_id", "text", "lang")
    val gated = GraftOps.curate(docs, minTokens = 10)
    assert(gated.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // doc 3 has >= 10 tokens but zero stopword signal
    val noStopGate = GraftOps.curate(docs, minTokens = 10,
      requireStopwordSignal = false)
    assert(noStopGate.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val out = gated.columns.toSet
    assert(out == Set("doc_id", "text", "lang", "n_tokens"))
    assert(gated.collect().head.getAs[Long]("n_tokens") == 12L)
  }

  test("curate dedups whitespace-variant texts keeping the smallest id") {
    import spark.implicits._
    val docs = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (4L, "the  quick   brown fox jumps over the lazy dog again and again", "en"))
      .toDF("doc_id", "text", "lang")
    val kept = GraftOps.curate(docs, minTokens = 10).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("curate never clobbers caller passthrough columns") {
    import spark.implicits._
    // caller columns named like plausible internals must survive
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again",
        "caller-data"))
      .toDF("doc_id", "text", "rn")
    val out = GraftOps.curate(docs, minTokens = 10)
    assert(out.columns.toSet == Set("doc_id", "text", "rn", "n_tokens"))
    assert(out.collect().head.getAs[String]("rn") == "caller-data")
  }
}
