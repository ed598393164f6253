package graft

import org.apache.spark.sql.functions._

import graft.ocr.{ImageOps, MultimodalOps}

/** Pins the image→embedding ring (r16): blockSums against a brute pixel
  * loop, the real-PNG round trip recovering the analytic formula, the
  * operator's unit-norm/NULL contracts, and the AutoK derivation —
  * including dual-path equality between a derived and an explicitly
  * pinned cell count on the same frame (the BPE-fallback discipline:
  * both paths must be THE SAME operator).
  */
class ImageEmbedSpec extends SparkSpec {

  private def grayOf(id: Long): ImageOps.Gray = {
    val img = ImageOps.decode(MultimodalOps.quadPatternPng(id))
      .fold(e => fail(s"fixture PNG undecodable: $e"), identity)
    ImageOps.grayscale(img)
  }

  test("blockSums matches a brute pixel loop on the real decode path") {
    for (id <- Seq(0L, 7L, 255L, 256L, 300L)) {
      val g = grayOf(id)
      val got = ImageOps.blockSums(g)
      assert(got.length == 64)
      // brute force: block k = y*8 + x/2 sums pixels (2x, y), (2x+1, y)
      val want = new Array[Long](64)
      for (y <- 0 until 8; x <- 0 until 16)
        want(y * 8 + x / 2) += g.pixels(y * 16 + x) & 0xff
      assert(got.toSeq == want.toSeq, s"id=$id")
      // and the decode recovered the analytic formula (r=g=b PNG is
      // lossless, luma(p,p,p) == p): spot-check pixel (3, 5)
      val p = ((3 * 3 + 3 * 5 * 5 + 3 * 5 * (1 + id % 256)) * 41 + id * 31) % 256
      assert((g.pixels(5 * 16 + 3) & 0xff) == p.toInt, s"id=$id pixel(3,5)")
    }
  }

  test("imageEmbed: unit norm, 64 dims, NULL for undecodable bytes") {
    val rows = Seq(
      (0L, MultimodalOps.quadPatternPng(0)),
      (1L, MultimodalOps.quadPatternPng(257)),
      (2L, Array[Byte](1, 2, 3))) // not an image
    val df = spark.createDataFrame(rows).toDF("doc_id", "content")
    val out = GraftOps.imageEmbed(df).orderBy("vec_id").collect()
    assert(out.length == 3)
    for (i <- 0 to 1) {
      val e = out(i).getSeq[Float](1)
      assert(e.length == 64)
      val n = e.map(v => v.toDouble * v).sum
      assert(math.abs(n - 1.0) < 1e-6, s"row $i norm² = $n")
    }
    assert(out(2).isNullAt(1), "undecodable image must embed to NULL")
  }

  test("near-duplicate images land at cosine ~1, distinct classes far below") {
    val df = spark.createDataFrame(Seq(
      (10L, MultimodalOps.quadPatternPng(10)),
      (266L, MultimodalOps.quadPatternPng(266)), // 10 + 256: near-dup
      (11L, MultimodalOps.quadPatternPng(11)))).toDF("doc_id", "content")
    val e = GraftOps.imageEmbed(df).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(e(10L), e(266L)) > 0.99, "same-class pair must be ~1")
    assert(cos(e(10L), e(11L)) < 0.96, "cross-class pair must miss the 0.96 gate")
  }

  test("autoK: ceil(N/target) clamped to [1, MaxAutoK]") {
    import graft.ops.MlOps.{autoK, AutoCellTarget, MaxAutoK}
    assert(AutoCellTarget == 256L)
    assert(autoK(0L) == 1)
    assert(autoK(1L) == 1)
    assert(autoK(256L) == 1)
    assert(autoK(257L) == 2)
    assert(autoK(5000L) == 20)
    assert(autoK(Long.MaxValue) == MaxAutoK)
  }

  test("semanticDedup derived K == the explicitly pinned same K (dual path)") {
    import spark.implicits._
    // 600 synthetic unit vectors -> derived K = ceil(600/256) = 3
    val vecs = (0L until 600L).map { i =>
      val a = new Array[Float](8)
      a((i % 8).toInt) = 1.0f
      a(((i / 8) % 8).toInt) += 0.3f
      val n = math.sqrt(a.map(v => v.toDouble * v).sum).toFloat
      (i, a.map(_ / n).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val auto = GraftOps.semanticDedup(df, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val pinned = GraftOps.semanticDedup(df, k = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(auto == pinned, "AutoK must resolve to exactly the pinned-K operator")
    // and the derived path actually split cells (not one degenerate cell)
    assert(auto.map(_._2).distinct.size == 3, "derived K=3 must yield 3 cells")
  }
}
