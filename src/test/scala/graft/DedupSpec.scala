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

  // Dual-path equality (the boilerplate/firstLineDedup discipline): the
  // default literal path (driver union-find under MaxLiteralEdges) and
  // the distributed label-propagation loop (maxLiteralEdges = 0) must
  // emit identical (doc_id, component) labelings — the literal path is
  // a physical-shape choice, never a semantic one.
  test("nearDupComponents: literal union-find path == distributed loop path") {
    val docs = Tables.documents(spark, sfDir)
    val lit = ops.DedupOps.nearDupComponents(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = ops.DedupOps.nearDupComponents(docs, maxLiteralEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lit.nonEmpty)
    assert(lit == loop)
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

  // Fixture-headroom invariant: the banded queries cap bucket membership
  // at MaxBucketDocs (per SIDE for the split queries) while their DuckDB
  // oracles expand uncapped buckets — equality holds only while no
  // fixture bucket reaches the cap. Assert the headroom directly at
  // every fixture scale the harness runs, so fixture drift (or a lowered
  // cap) fails HERE with a named invariant instead of as a confusing
  // oracle hash mismatch.
  test("fixture band buckets stay below MaxBucketDocs on every side") {
    import org.apache.spark.sql.functions._
    val cap = ops.DedupOps.MaxBucketDocs
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")
         if new java.io.File(dir).isDirectory) {
      val idx = ops.DedupOps.lshIndex(Tables.documents(spark, dir))
      // the three banded splits the registry runs: combined
      // (q_dedup_minhash_pairs + the DedupSpec replays), index/new
      // (q_dedup_incremental), train/val (q_split_leakage)
      val isNew = col("doc_id") % 3 === 0
      val isVal = substring(
        md5(concat(lit("sp:"), col("doc_id").cast("string"))), 1, 1)
        .isin("c", "d", "e", "f")
      val m = idx.groupBy("band_idx", "band_hash")
        .agg(
          count(lit(1)).as("all"),
          sum(when(isNew, 1).otherwise(0)).as("nw"),
          sum(when(!isNew, 1).otherwise(0)).as("ix"),
          sum(when(isVal, 1).otherwise(0)).as("vl"),
          sum(when(!isVal, 1).otherwise(0)).as("tr"))
        .agg(max("all").as("all"), max("nw").as("nw"), max("ix").as("ix"),
          max("vl").as("vl"), max("tr").as("tr"))
        .collect().head
      for (side <- Seq("all", "nw", "ix", "vl", "tr"))
        assert(m.getAs[Long](side) < cap,
          s"$dir: text band bucket side '$side' has ${m.getAs[Long](side)} " +
            s"docs — at/over MaxBucketDocs=$cap; capped Spark queries and " +
            "uncapped oracles would diverge")
      // the image aHash banding (q_image_neardup) shares the cap via
      // expandCappedBuckets; its bands derive from the ahash query's rows
      val imgMax = SparkEntry.queries("q_image_ahash")(spark, dir)
        .select(col("doc_id"), explode(array((0 until 4).map(b =>
          struct(lit(b).as("bi"),
            substring(col("ahash"), 1 + 4 * b, 4).as("bv"))): _*)).as("bd"))
        .groupBy("bd.bi", "bd.bv").agg(count(lit(1)).as("n"))
        .agg(max("n")).collect().head.getLong(0)
      assert(imgMax < cap,
        s"$dir: image aHash band bucket has $imgMax docs — " +
          s"at/over MaxBucketDocs=$cap")
    }
  }

  // Independent re-derivation of the incremental-admission policy: the
  // distributed operator's per-source totals must equal a driver-side
  // replay of "confirmed candidate vs index → dropped_index, else vs a
  // smaller-id batch doc → dropped_batch, else admitted" computed from
  // the separately-verified pairs and signature queries.
  test("q_dedup_incremental == driver-side replay over pairs + signatures") {
    val pairs = SparkEntry.queries("q_dedup_minhash_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sigs = SparkEntry.queries("q_minhash_signatures")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    def confirmed(a: Long, b: Long): Boolean =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y } >= ops.DedupOps.AgreeSlots
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val conf = pairs.filter { case (a, b) => confirmed(a, b) }
    def neighbors(n: Long): Seq[Long] =
      conf.collect { case (a, b) if a == n => b case (a, b) if b == n => a }.toSeq
    val expected = docs.filter(_._1 % 3 == 0).groupBy(_._2).map { case (src, ds) =>
      val sts = ds.map { case (n, _) =>
        val nb = neighbors(n)
        if (nb.exists(_ % 3 != 0)) "dropped_index"
        else if (nb.exists(o => o % 3 == 0 && o < n)) "dropped_batch"
        else "admitted"
      }
      src -> (ds.length.toLong, sts.count(_ == "admitted").toLong,
        sts.count(_ == "dropped_index").toLong, sts.count(_ == "dropped_batch").toLong)
    }
    val got = SparkEntry.queries("q_dedup_incremental")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
    // the fixture must actually exercise the dedup path (some doc dropped)
    assert(got.values.map(v => v._3 + v._4).sum > 0)
  }

  // Same replay discipline for the eval-split leakage audit: a val doc
  // is leaked iff some confirmed (>= AgreeSlots agreement) candidate
  // partner lies in train, with the split recomputed independently.
  test("q_split_leakage == driver-side replay over pairs + signatures") {
    val pairs = SparkEntry.queries("q_dedup_minhash_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sigs = SparkEntry.queries("q_minhash_signatures")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    def agree(a: Long, b: Long): Boolean =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y } >= ops.DedupOps.AgreeSlots
    def isVal(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sp:$id".getBytes("UTF-8"))
      "cdef".contains(f"${(md(0) >> 4) & 0xf}%x")
    }
    val conf = pairs.filter { case (a, b) => agree(a, b) }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val leaked = ds.count { case (id, _) =>
        isVal(id) && conf.exists { case (a, b) =>
          (a == id && !isVal(b)) || (b == id && !isVal(a)) }
      }
      val nVal = ds.count(d => isVal(d._1))
      src -> (ds.length.toLong - nVal, nVal.toLong, leaked.toLong,
        (nVal - leaked).toLong)
    }
    val got = SparkEntry.queries("q_split_leakage")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("substringDedup: broadcast fast path == digest-join path on the fixture") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val fast = collect(ops.DedupOps.substringDedup(docs))
    val join = collect(ops.DedupOps.substringDedup(docs, maxLiteralDigests = 0))
    assert(fast.nonEmpty && fast.count(_._3 > 0) > 0,
      "fixture exercises no removal — the dual-path check is vacuous")
    assert(fast.toSeq == join.toSeq)
    // untouched docs keep their ORIGINAL text byte-for-byte
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    fast.filter(_._3 == 0).foreach { case (id, _, _, cleaned) =>
      assert(cleaned == texts(id), s"untouched doc $id was rewritten")
    }
  }

  test("substringDedup semantics: chaining, within-doc repeats, remove-all, short docs") {
    import spark.implicits._
    val k = 4
    // docs 0/1 share a 6-token run (> k: chained from 3 duplicated
    // 4-windows) embedded in distinct context; doc 2 repeats a 4-token
    // phrase TWICE within itself (both occurrences removed); doc 3 is
    // entirely a copy of doc 0's run (fully removed -> empty rebuild);
    // doc 4 is < k tokens; doc 5 shares nothing and keeps its weird
    // whitespace untouched.
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (0L, "src", s"intro words $run closing remark"),
      (1L, "src", s"other opening $run different tail"),
      (2L, "src", "p q r s MID p q r s"),
      (3L, "src", run),
      (4L, "src", "tiny doc here"),
      (5L, "src", "un\ttouched   doc with  spacing kept")
    ).toDF("doc_id", "source", "text")
    val got = ops.DedupOps.substringDedup(docs, k = k).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(0L) == ((10L, 6L, "intro words closing remark")),
      s"cross-doc chained run: ${got(0L)}")
    assert(got(1L) == ((10L, 6L, "other opening different tail")))
    // doc 2: "p q r s" occurs at positions 0 and 5 -> both removed,
    // the 4-windows spanning MID ("q r s MID" etc.) are unique
    assert(got(2L) == ((9L, 8L, "MID")), s"within-doc repeat: ${got(2L)}")
    assert(got(3L) == ((6L, 6L, "")), s"fully-duplicated doc: ${got(3L)}")
    assert(got(4L) == ((3L, 0L, "tiny doc here")))
    assert(got(5L) == ((6L, 0L, "un\ttouched   doc with  spacing kept")),
      "short/unique docs must keep original whitespace")
    // dual-path equality on the synthetic corpus too
    val join = ops.DedupOps.substringDedup(docs, k = k, maxLiteralDigests = 0)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(join == got)
  }
}
