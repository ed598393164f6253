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
}
