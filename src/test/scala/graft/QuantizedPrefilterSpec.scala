package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the safety of semanticDedup's int8 prefilter: the within-cell
  * pair join compares per-vector-scaled int8 quantizations at
  * `threshold − max(slack, per-pair worst-case bound)` and only
  * float-rechecks the survivors. The fixture tests measure the actual
  * quantization error over EVERY pair of the sf0.01 corpus (order-of-
  * magnitude headroom under the default slack — so the slack is the
  * effective cutoff there), and the adversarial test drives a spiky
  * high-error corpus through the OPERATOR and checks its decisions
  * against a brute-force float computation — the adaptive margin must
  * keep the prefilter exact even where a fixed slack would drop true
  * duplicates.
  */
class QuantizedPrefilterSpec extends SparkSpec {

  private val DefaultSlack = 0.08

  // the PRODUCTION quantizer — a local copy here would let a quantizer
  // edit silently outrun the spec
  private def int8(emb: Column): Column = graft.ops.MlOps.int8(emb)

  test("quantized cosine stays an order of magnitude inside the slack") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"), int8(col("embedding")).as("qv"))
    val asFloat = (c: Column) => transform(c, _.cast("float"))
    val maxErr = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"),
        col("qv").as("qa"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("eb"),
        col("qv").as("qb")))
      .filter(col("ia") < col("ib"))
      .select(abs(
        graft.functions.GraftFunctions.cosine_sim(col("ea"), col("eb")) -
          graft.functions.GraftFunctions.cosine_sim(
            asFloat(col("qa")), asFloat(col("qb")))).as("err"))
      .agg(max(col("err"))).head.getDouble(0)
    assert(maxErr < DefaultSlack / 10,
      f"int8 quantization error $maxErr%.5f has lost its 10x headroom " +
        f"under the $DefaultSlack prefilter slack")
  }

  test("prefilter never drops a float-passing pair at sf0.01") {
    val threshold = 0.42
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"), int8(col("embedding")).as("qv"))
    val asFloat = (c: Column) => transform(c, _.cast("float"))
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"),
        col("qv").as("qa"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("eb"),
        col("qv").as("qb")))
      .filter(col("ia") < col("ib"))
      .select(
        graft.functions.GraftFunctions.cosine_sim(col("ea"), col("eb")).as("f"),
        graft.functions.GraftFunctions.cosine_sim(
          asFloat(col("qa")), asFloat(col("qb"))).as("q"))
      .filter(col("f") >= threshold && col("q") < threshold - DefaultSlack)
    assert(pairs.isEmpty,
      "int8 prefilter would drop pairs the float cosine accepts")
  }

  test("cosine_sim_i8 == cast-to-float cosine, bit-identical on every pair") {
    // the byte-reading expression is what the pair join actually runs
    // (the cast spelling is an interpreted CodegenFallback); int8→double
    // is exact, so the two must agree to the last bit
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), int8(col("embedding")).as("qv"))
    val asFloat = (c: Column) => transform(c, _.cast("float"))
    val diff = emb.select(col("vec_id").as("ia"), col("qv").as("qa"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("qv").as("qb")))
      .filter(col("ia") < col("ib"))
      .filter(
        graft.functions.GraftFunctions.cosine_sim_i8(col("qa"), col("qb")) =!=
          graft.functions.GraftFunctions.cosine_sim(
            asFloat(col("qa")), asFloat(col("qb"))))
    assert(diff.isEmpty, "cosine_sim_i8 diverged from the cast spelling")
  }

  test("adaptive margin: spiky high-error corpus decides exactly (vs brute-force float)") {
    import spark.implicits._
    // dim-128 spiky vectors: one dominant component + small noise, so
    // the per-vector error BOUND εv ≈ √128/254 ≈ 0.045 widens the
    // margin past the fixed slack. (The pairs here are far from the
    // threshold — this test pins end-to-end operator/brute-force
    // equivalence on a moderately nasty corpus; the drop-band test
    // below is the one that distinguishes adaptive from fixed-slack.)
    // k=1 puts every pair in one cell, so brute-force float cosine over
    // all pairs IS the expected answer.
    val dim = 128
    val rnd = new scala.util.Random(7)
    def spiky(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(dim)((r.nextDouble() * 0.004 - 0.002).toFloat)
      v(seed % dim) = 1.0f
      v
    }
    // pairs of neighbors built from shared spikes land near ±threshold;
    // unrelated seeds land near 0
    val vecs = (0 until 40).map { i =>
      val base = spiky(i / 2) // consecutive ids share a spike direction
      if (i % 2 == 1) base(rnd.nextInt(dim)) += 0.35f
      (i.toLong, base)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = graft.GraftOps.semanticDedup(df, k = 1, iters = 1, threshold = 0.42)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until dim) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.map { case (id, v) =>
      id -> (if (vecs.exists { case (j, w) => j < id && cos(w, v) >= 0.42 }) 1 else 0)
    }.toMap
    assert(got == expected,
      s"operator decisions diverged from brute-force float: " +
        s"${got.toSeq.sorted} vs ${expected.toSeq.sorted}")
    assert(expected.values.sum > 0, "fixture produced no duplicates — test is vacuous")
  }

  test("adaptive margin keeps a pair the fixed slack would drop (quantized cos 0, float cos 0.43)") {
    import spark.implicits._
    // Engineered drop-band pair: two vectors whose ENTIRE shared mass
    // lives in sub-quantum components (|s| < half a quantization step,
    // so int8 wipes them to 0) plus one full-scale spike each in
    // DIFFERENT dimensions. Quantized cosine is exactly 0 — far below
    // threshold − slack = 0.34, so a fixed-slack prefilter silently
    // drops the pair — while the float cosine is ≈ 0.43 ≥ threshold.
    // The carried error bound εv ≈ 0.67 ≥ 0.5 disables the prefilter
    // for the pair, the float re-check runs, and is_dup must be 1.
    val n = 50652
    val s = 0.49f
    def vec(spikeDim: Int): Array[Float] = {
      val v = Array.fill(n + 2)(s)
      v(0) = 0f; v(1) = 0f; v(spikeDim) = 127f
      v
    }
    val (a, b) = (vec(0), vec(1))
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i)
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val fcos = cos(a, b)
    assert(fcos > 0.42 && fcos < 0.46, s"fixture drifted: float cos = $fcos")
    // quantized: every s rounds to 0 (0.49 * 127/127 < 0.5), spikes in
    // different dims -> quantized cosine exactly 0
    val got = graft.GraftOps.semanticDedup(
      Seq((0L, a), (1L, b)).toDF("vec_id", "embedding"),
      k = 1, iters = 1, threshold = 0.42)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(0L -> 0, 1L -> 1),
      s"adaptive margin failed to keep the drop-band pair: $got")
  }

  test("semanticDedup: zero vectors are inert — never duplicates, never poison neighbors") {
    import spark.implicits._
    // Spark 4 runs ANSI by default: an unguarded norm division would
    // throw DIVIDE_BY_ZERO here. And an unguarded COSINE would be
    // 0/0 = NaN, which BOTH engines compare greater than any threshold
    // — flagging the zero vector as a dup of an arbitrary cellmate AND
    // its larger-id cellmates as dups of IT, engine-consistently, so
    // the oracle compare could not catch it (r15 ADVICE). The guard
    // keeps zero-norm vectors out of the pair machinery entirely:
    // similar to nothing, dedups nothing.
    val df = Seq(
      (0L, Array(1f, 2f, 3f)),
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(1f, 2f, 3f)), // true duplicate of vec 0 — still caught
      (3L, Array(-3f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = graft.GraftOps.semanticDedup(df, k = 1, iters = 1, threshold = 0.42)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 0),
      s"zero-vector guard broken: $got")
  }

  test("semanticContamination: zero-vector docs on either frame flag nothing") {
    import spark.implicits._
    // An empty document embeds to the zero vector (embedFromText) —
    // routine in real crawl corpora. It must neither be flagged (as a
    // corpus doc) nor flag same-cell corpus docs (as a benchmark doc).
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, ""), // zero vector
      (2L, "completely different vocabulary in this row")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // exact hit on doc 0
      (101L, "")).toDF("doc_id", "text") // zero vector on the benchmark side
    val got = graft.ops.MlOps.semanticContamination(
        corpus, bench, threshold = 0.96, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq.sorted == Seq(
      (0L, 1L, true),  // the verbatim copy is still caught, exactly once
      (1L, 0L, false), // the zero-vector corpus doc is not flagged
      (2L, 0L, false)), s"zero-vector contamination guard broken: ${got.toSeq}")
  }

  test("zero vectors quantize to zeros (their NaN cosine marks dups consistently in both engines)") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    // Row-based collect: Array[Byte] ENCODES as BINARY, so a typed
    // Dataset can't read the array<tinyint> column back directly
    val q = df.select(col("vec_id"), int8(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(q(1L) == Seq[Byte](0, 0, 0))
    assert(q(2L) == Seq[Byte](42, 85, 127))
  }
}
