package graft

import graft.ocr.MultimodalOps

/** Pins the audio→embedding ring (r16): sampleBinSums against a brute
  * sample loop over the REAL WAV round trip (the synth writes through the
  * real javax.sound writer, the featurizer reads through the real
  * reader), the operator's unit-norm/NULL contracts, and the fixture's
  * class geometry (same-seed clips identical, cross-seed far below the
  * 0.96 semdedup gate) — the ImageEmbedSpec discipline for the third
  * modality.
  */
class AudioEmbedSpec extends SparkSpec {

  private def quadSample(seed: Long, k: Long): Long = {
    val j = seed * 131 + k
    (j * j * 7 + j * 11) % 2003 - 1001
  }

  test("sampleBinSums matches a brute sample loop on the real decode path") {
    for (seed <- Seq(0L, 7L, 128L, 198L)) {
      val wav = MultimodalOps.wavSynthQuad(seed, 420, 1, 8000)
      val got = MultimodalOps.sampleBinSums(wav, 64)
      assert(got != null && got.length == 64)
      val want = new Array[Long](64)
      for (k <- 0 until 420) want((k * 64) / 420) += quadSample(seed, k.toLong)
      assert(got.toSeq == want.toSeq, s"seed=$seed")
    }
  }

  test("sampleBinSums mixes channels down by interleaved index") {
    // 2 channels, 6 frames -> 12 interleaved samples into 4 bins of 3
    val wav = MultimodalOps.wavSynthQuad(3L, 6, 2, 8000)
    val got = MultimodalOps.sampleBinSums(wav, 4)
    val want = new Array[Long](4)
    for (k <- 0 until 12) want((k * 4) / 12) += quadSample(3L, k.toLong)
    assert(got.toSeq == want.toSeq)
  }

  test("audioEmbed: unit norm, 64 dims, NULL for undecodable bytes") {
    val rows = Seq(
      (0L, MultimodalOps.wavSynthQuad(0, 420, 1, 8000)),
      (1L, MultimodalOps.wavSynthQuad(57, 420, 1, 8000)),
      (2L, Array[Byte](1, 2, 3))) // not a WAV
    val df = spark.createDataFrame(rows).toDF("doc_id", "content")
    val out = GraftOps.audioEmbed(df).orderBy("vec_id").collect()
    assert(out.length == 3)
    for (i <- 0 to 1) {
      val e = out(i).getSeq[Float](1)
      assert(e.length == 64)
      val n = e.map(v => v.toDouble * v).sum
      assert(math.abs(n - 1.0) < 1e-6, s"row $i norm² = $n")
    }
    assert(out(2).isNullAt(1), "undecodable audio must embed to NULL")
  }

  test("same-seed clips land at cosine 1, distinct seeds far below the gate") {
    val df = spark.createDataFrame(Seq(
      (10L, MultimodalOps.wavSynthQuad(10, 420, 1, 8000)),
      (209L, MultimodalOps.wavSynthQuad(10, 420, 1, 8000)), // same class
      (11L, MultimodalOps.wavSynthQuad(11, 420, 1, 8000)))).toDF("doc_id", "content")
    val e = GraftOps.audioEmbed(df).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(e(10L), e(209L)) > 0.999999, "same-class pair must be 1")
    assert(cos(e(10L), e(11L)) < 0.96, "cross-class pair must miss the 0.96 gate")
  }
}
