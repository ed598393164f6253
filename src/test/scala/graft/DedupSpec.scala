package graft

import scala.collection.mutable

/** Independent re-derivation of the dedup clustering: a driver-side
  * union-find over the collected candidate pairs must produce exactly the
  * labels the distributed min-label propagation emits.
  */
class DedupSpec extends SparkSpec {

  test("q_dedup_clusters == union-find over q_dedup_minhash_pairs") {
    val pairs = SparkEntry.queries("q_dedup_minhash_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    pairs.foreach { case (a, b) => union(a, b) }
    val expected = parent.keys
      .groupBy(find)
      .values
      .flatMap { comp => val label = comp.min; comp.map(_ -> label) }
      .toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (n, label) => assert(label == expected(n), s"node $n") }
    assert(pairs.nonEmpty && got.nonEmpty)
  }

  // Degenerate corpus: every document identical (mass-duplicated
  // boilerplate — the normal worst case in web-crawl dedup). All docs land
  // in the SAME band bucket for every band; without the MaxBucketDocs cap
  // this builds an O(corpus) array in one aggregation row and O(n²) pairs.
  // The cap must bound the expansion while still linking every surviving
  // doc to the keeper (min doc_id retained by construction).
  test("LSH bucket cap bounds a degenerate all-identical corpus") {
    import spark.implicits._
    val n = 5000 // ~20x the cap
    val docs = spark.range(n).toDF("doc_id")
      .selectExpr("doc_id", "'the same boilerplate text appears on every single page' AS text")
    val pairs = ops.DedupOps.lshCandidatePairs(docs).collect()
    val cap = ops.DedupOps.MaxBucketDocs
    // capped: exactly C(cap, 2) distinct pairs (all 4 band buckets retain
    // the same smallest `cap` doc_ids), never the uncapped C(n, 2)
    assert(pairs.length == cap * (cap - 1) / 2, s"got ${pairs.length} pairs")
    // keeper invariant: doc 0 (the cluster's canonical keeper) is linked in
    assert(pairs.count(r => r.getLong(0) == 0L) == cap - 1)
  }
}
