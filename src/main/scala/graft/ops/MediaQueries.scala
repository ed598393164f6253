package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}
import graft.ocr.{ImageOps, MultimodalOps, OcrPipeline, StubOcr}

/** Driver-facing queries for the OCR pipeline (R1-R10) and multimodal
  * columns. Test images are generated in-flight from `documents` rows —
  * real PNGs (decode/grayscale/binarize actually run) with the expected
  * text embedded for the stub backend — so the whole pipeline is
  * oracle-checkable against the documents table itself.
  */
object MediaQueries extends QueryModule {

  private val wcSql =
    s"CAST(len(${TextOps.WordsSql}) AS BIGINT)"

  /** documents → (path, content) binary rows with embedded ground truth. */
  private def fileRows(s: org.apache.spark.sql.SparkSession, d: String) = {
    val basePng = ImageOps.blankPng(16, 8)
    val mkImage = udf((text: String) => StubOcr.embed(basePng, text))
    Tables.documents(s, d)
      .filter(col("doc_id") < 500)
      .select(
        concat(col("doc_id"), lit(".png")).as("path"),
        mkImage(col("text")).as("content"))
  }

  /** Shared analytic-aHash oracle scaffold: the px/tot/blocks/bits CTE
    * chain parameterized by the SQL pixel expression (in x, y, doc_id),
    * plus the nibble-packing select expression — ONE statement of the
    * bit/threshold convention serving both image queries, so a change
    * to the packing cannot silently diverge between them.
    */
  private def aHashCtes(pixelExpr: String): String =
    s"""px AS (
       |  SELECT doc_id, x, y, $pixelExpr AS p
       |  FROM documents,
       |       unnest(generate_series(0, 15)) AS tx(x),
       |       unnest(generate_series(0, 7)) AS ty(y)
       |  WHERE doc_id < 500),
       |tot AS (SELECT doc_id, SUM(p) AS ts FROM px GROUP BY doc_id),
       |blocks AS (SELECT doc_id, (x // 2) AS i, y AS j, SUM(p) AS bs
       |           FROM px GROUP BY doc_id, (x // 2), y),
       |bits AS (SELECT b.doc_id, j * 8 + i AS k,
       |                CASE WHEN bs * 128 > ts * 2 THEN 1 ELSE 0 END AS bit
       |         FROM blocks b JOIN tot t ON b.doc_id = t.doc_id)""".stripMargin

  /** SQL spelling of [[MultimodalOps.quadPatternPng]]'s pixel formula
    * (in doc_id, x, y) — shared with the image-embedding queries in
    * [[MlOps]] so the fixture cannot diverge between the aHash and
    * embedding rings.
    */
  private[ops] val QuadPxSql: String =
    "CASE WHEN doc_id >= 256 AND x = 0 AND y = 0" +
      " THEN (((x*x + 3*y*y + x*y*(1 + doc_id % 256)) * 41 + doc_id * 31) % 256 + 8) % 256" +
      " ELSE ((x*x + 3*y*y + x*y*(1 + doc_id % 256)) * 41 + doc_id * 31) % 256 END"

  private val AHashNibbles: String = (0 until 16).map { n =>
    s"substr('0123456789abcdef', 1 + CAST(SUM(CASE WHEN k // 4 = $n" +
      s" THEN bit * (1 << (3 - k % 4)) ELSE 0 END) AS INT), 1)"
  }.mkString("concat(", ", ", ")")

  def queries: Seq[Q] = Seq(
    // Full R1-R10 path: dispatch → fused preprocess → per-partition OCR →
    // word count. Output must equal the source documents exactly.
    Q(
      "q_ocr_pipeline",
      s"""SELECT doc_id, text, $wcSql AS text_count
         |FROM documents WHERE doc_id < 500 ORDER BY doc_id"""
    ) { (s, d) =>
      OcrPipeline.run(fileRows(s, d))
        .select(
          regexp_extract(col("path"), "(\\d+)\\.png", 1).cast("long").as("doc_id"),
          col("text"), col("text_count"))
        .orderBy("doc_id")
    },

    // Format dispatch (R3): extension routing with the reference's error
    // string; gif rows carry the error, never disappear.
    Q(
      "q_ocr_dispatch",
      s"""SELECT doc_id,
         |       CASE WHEN doc_id % 4 = 3 THEN 'Invalid file format' END AS error,
         |       CASE WHEN doc_id % 4 = 3 THEN NULL ELSE text END AS text,
         |       CASE WHEN doc_id % 4 = 3 THEN 0 ELSE $wcSql END AS text_count
         |FROM documents WHERE doc_id < 500 ORDER BY doc_id"""
    ) { (s, d) =>
      val basePng = ImageOps.blankPng(16, 8)
      val mkImage = udf((text: String) => StubOcr.embed(basePng, text))
      val ext = element_at(
        array(lit("png"), lit("jpg"), lit("jpeg"), lit("gif")),
        (col("doc_id") % 4).cast("int") + 1)
      val files = Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(
          concat(col("doc_id"), lit("."), ext).as("path"),
          mkImage(col("text")).as("content"))
      OcrPipeline.run(files)
        .select(
          regexp_extract(col("path"), "^(\\d+)\\.", 1).cast("long").as("doc_id"),
          col("error"), col("text"), col("text_count"))
        .orderBy("doc_id")
    },

    // Real-JPEG end-to-end: the content bytes are actual JPEG (format
    // sniffed from magic bytes by imageMeta, never the extension), so the
    // jpeg decode branch runs in the full pipeline — the path the
    // reference advertises (`.jpg` accepted, main.go:75) but cannot serve
    // (no image/jpeg import registers a decoder there: documented
    // divergence, SURVEY.md §2A R4). Width/height prove a real decode.
    Q(
      "q_ocr_jpeg",
      s"""SELECT doc_id, 'jpeg' AS format, text, $wcSql AS text_count,
         |       CAST(16 AS INT) AS width, CAST(8 AS INT) AS height
         |FROM documents WHERE doc_id < 500 ORDER BY doc_id"""
    ) { (s, d) =>
      val baseJpeg = ImageOps.blankJpeg(16, 8)
      val mkImage = udf((text: String) => StubOcr.embed(baseJpeg, text))
      val sniff = udf((b: Array[Byte]) => MultimodalOps.imageMeta(b).format)
      val files = Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(
          concat(col("doc_id"), lit(".jpg")).as("path"),
          mkImage(col("text")).as("content"))
      OcrPipeline.run(files)
        .join(
          broadcast(files.select(col("path"), sniff(col("content")).as("format"))),
          "path")
        .select(
          regexp_extract(col("path"), "(\\d+)\\.jpg", 1).cast("long").as("doc_id"),
          col("format"), col("text"), col("text_count"),
          col("width"), col("height"))
        .orderBy("doc_id")
    },

    // JSON sink (R10): byte-exact {"text":…,"textCount":…} shape of
    // main.go:216-219.
    Q(
      "q_ocr_json",
      // to_json on both sides so quote/backslash/control escaping matches
      s"""SELECT doc_id,
         |       '{"text":' || to_json(text) || ',"textCount":' || CAST($wcSql AS INT) || '}' AS json
         |FROM documents WHERE doc_id < 500 ORDER BY doc_id"""
    ) { (s, d) =>
      OcrPipeline.toJsonResults(OcrPipeline.run(fileRows(s, d)))
        .select(
          regexp_extract(col("path"), "(\\d+)\\.png", 1).cast("long").as("doc_id"),
          col("json"))
        .orderBy("doc_id")
    },

    // Multimodal STUB operators, oracle-checked: the "video"/"audio" blob
    // is the document's UTF-8 bytes (pure ASCII — verified), so DuckDB
    // can reproduce the content-hash-derived outputs exactly. The Spark
    // side runs the real stub UDFs over real binary columns.
    Q(
      "q_frame_sample",
      """WITH f AS (SELECT doc_id, md5(text) AS base, n_chars FROM documents WHERE doc_id < 200),
        |x AS (SELECT doc_id, base, unnest(generate_series(0, n_chars - 1, 100)) AS off FROM f)
        |SELECT doc_id,
        |       CAST(off // 100 AS INT) AS frame_index,
        |       CAST(off AS BIGINT) AS offset_ms,
        |       md5(base || ':' || CAST(off // 100 AS INT)) AS frame_id
        |FROM x ORDER BY doc_id, frame_index"""
    ) { (s, d) =>
      val sample = udf((text: String, durationMs: Long) =>
        MultimodalOps.sampleFramesStub(text.getBytes("UTF-8"), durationMs, 10.0))
      Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(sample(col("text"), col("n_chars"))).as("f"))
        .select(
          col("doc_id"),
          col("f.index").as("frame_index"),
          col("f.offset_ms").as("offset_ms"),
          col("f.frame_id").as("frame_id"))
        .orderBy("doc_id", "frame_index")
    },

    // Fixture invariant this oracle leans on: documents.text is pure
    // ASCII (byte == char == codepoint) and never empty (>= 10 words) —
    // both verified against all SFs. n_samples is a BYTE count.
    Q(
      "q_audio_features",
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_samples,
        |       list_reduce(list_transform(string_split(text, ''), c -> CAST(ord(c) AS DOUBLE)),
        |                   (x, y) -> x + y) / length(text) AS mean_amplitude,
        |       sqrt(list_reduce(list_transform(string_split(text, ''),
        |                        c -> CAST(ord(c) AS DOUBLE) * CAST(ord(c) AS DOUBLE)),
        |                        (x, y) -> x + y) / length(text)) AS rms,
        |       md5(text) AS clip_id
        |FROM documents ORDER BY doc_id"""
    ) { (s, d) =>
      val feats = udf((text: String) =>
        MultimodalOps.audioFeaturesStub(text.getBytes("UTF-8")))
      Tables.documents(s, d)
        .select(col("doc_id"), feats(col("text")).as("a"))
        .select(
          col("doc_id"),
          col("a.n_samples").as("n_samples"),
          col("a.mean_amplitude").as("mean_amplitude"),
          col("a.rms").as("rms"),
          col("a.clip_id").as("clip_id"))
        .orderBy("doc_id")
    },

    // REAL WAV audio decode (javax.sound.sampled) through the binary-
    // column pipeline: synthesize a PCM16 WAV per document from an
    // integer sample recurrence, decode it with the real reader, and
    // report per-block RMS. The oracle recomputes every sample
    // analytically from the same recurrence (the q_image_ahash
    // treatment for the audio modality), and its literal decoder='wav'
    // column pins the REAL decode path: a fallback to the stub would
    // mismatch. Sum-of-squares is exact BIGINT on both sides; the one
    // sqrt is IEEE-identical, then the portable round6.
    Q(
      "q_audio_wav",
      """WITH p AS (
        |  SELECT doc_id,
        |         800 + (doc_id % 5) * 80 AS nf,
        |         1 + doc_id % 2 AS ch
        |  FROM documents WHERE doc_id < 300),
        |s AS (
        |  SELECT doc_id, nf, ch, k,
        |         ((doc_id * 31 + k * 7) % 2003) - 1001 AS v
        |  FROM p, unnest(generate_series(0, CAST(nf * ch - 1 AS BIGINT))) AS t(k)),
        |b AS (
        |  SELECT doc_id, nf, ch, CAST(k // ch // 400 AS INT) AS block,
        |         SUM(v * v) AS ss, COUNT(*) AS n
        |  FROM s GROUP BY 1, 2, 3, 4)
        |SELECT doc_id,
        |       CAST(nf AS BIGINT) AS n_frames,
        |       CAST(ch AS INT) AS channels,
        |       CAST(8000 AS INT) AS sample_rate,
        |       CAST(nf * 1000 // 8000 AS BIGINT) AS duration_ms,
        |       block,
        |       floor(sqrt(CAST(ss AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS rms,
        |       'wav' AS decoder
        |FROM b ORDER BY doc_id, block"""
    ) { (s, d) =>
      val mkWav = udf((docId: Long) => MultimodalOps.wavSynth(
        docId, (800 + docId % 5 * 80).toInt, (1 + docId % 2).toInt, 8000))
      val feats = udf((bytes: Array[Byte]) =>
        MultimodalOps.audioFeatures(bytes, 400))
      Tables.documents(s, d)
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), feats(mkWav(col("doc_id"))).as("a"))
        .select(
          col("doc_id"),
          col("a.n_frames").as("n_frames"),
          col("a.channels").as("channels"),
          col("a.sample_rate").as("sample_rate"),
          col("a.duration_ms").as("duration_ms"),
          posexplode(col("a.rms_blocks")).as(Seq("block", "rms")),
          col("a.decoder").as("decoder"))
        .orderBy("doc_id", "block")
    },

    // REAL image resize (bilinear, java.awt) through the binary-column
    // pipeline: generate → resize to 8x4 → re-decode the re-encoded PNG
    // and read its header. The oracle pins the decoded dims/format —
    // if resize or the PNG re-encode broke, the header check fails.
    Q(
      "q_image_resize",
      """SELECT doc_id,
        |       'png' AS format,
        |       CAST(8 AS INT) AS width,
        |       CAST(4 AS INT) AS height,
        |       true AS valid
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id"""
    ) { (s, d) =>
      val mkPng = udf((w: Int) => MultimodalOps.whitePng(w, 8))
      val resize = udf((b: Array[Byte]) => MultimodalOps.resize(b, 8, 4))
      val meta = udf((b: Array[Byte]) => MultimodalOps.imageMeta(b))
      Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(
          col("doc_id"),
          mkPng((lit(8) + col("doc_id") % 16).cast("int")).as("content"))
        .select(col("doc_id"), meta(resize(col("content"))).as("m"))
        .select(
          col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.valid").as("valid"))
        .orderBy("doc_id")
    },

    // Perceptual average-hash (aHash) — the image near-dup signature a
    // multimodal training pipeline computes per image. The pixel content
    // is a deterministic per-doc gradient, so the oracle recomputes the
    // EXACT 64-bit hash analytically from the pixel formula while the
    // Spark side earns it the real way: PNG encode → ImageIO decode →
    // Go-parity grayscale → integer-exact block comparison. Any defect in
    // decode, grayscale, or blocking breaks the full-value hash match.
    Q(
      "q_image_ahash",
      s"""WITH ${aHashCtes("(doc_id * 31 + x * 7 + y * 13) % 256")}
         |SELECT doc_id, $AHashNibbles AS ahash
         |FROM bits GROUP BY doc_id ORDER BY doc_id"""
    ) { (s, d) =>
      // RGB (not TYPE_BYTE_GRAY): Java's getRGB on a gray image applies a
      // gray→sRGB conversion that shifts pixel values; an RGB PNG with
      // r=g=b=p round-trips losslessly and luma(p,p,p) == p exactly
      val mkGradient = udf { (id: Long) =>
        val img = new java.awt.image.BufferedImage(
          16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 16) {
            val p = ((id * 31 + x * 7 + y * 13) % 256).toInt
            img.setRGB(x, y, (p << 16) | (p << 8) | p)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        baos.toByteArray
      }
      val ahash = udf { (b: Array[Byte]) =>
        ImageOps.decode(b).toOption
          .map(img => ImageOps.aHash(ImageOps.grayscale(img)))
          .orNull
      }
      Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), ahash(mkGradient(col("doc_id"))).as("ahash"))
        .orderBy("doc_id")
    },

    // Image near-dup: the multimodal sibling of the text LSH dedup —
    // perceptual aHash computed through the REAL decode path, banded
    // into 4 x 16-bit slices (docs sharing any band are candidates —
    // same capped-bucket discipline as the text MinHash bands), then
    // verified by full 64-bit hamming distance <= 6. The fixture
    // image (a quadratic pattern, chosen so distinct ids hash distinctly
    // — a pure gradient is brightness-shift degenerate under aHash)
    // repeats with period 256 in doc_id, and ids >= 256 get a
    // +8 perturbation of pixel (0,0) — so (id, id+256) are NEAR (not
    // exact) duplicate images; the oracle replays the pixel formula
    // analytically and computes hamming from the bit table.
    Q(
      "q_image_neardup",
      {
        s"""WITH ${aHashCtes(QuadPxSql)},
           |hsh AS (SELECT doc_id, $AHashNibbles AS ahash FROM bits GROUP BY doc_id),
           |bands AS (SELECT doc_id, bi, substr(ahash, 1 + 4 * bi, 4) AS bv
           |          FROM hsh, unnest(generate_series(0, 3)) AS tb(bi)),
           |pairs AS (
           |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM bands a JOIN bands b
           |    ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id),
           |ham AS (
           |  SELECT p.d1, p.d2,
           |         CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
           |  FROM pairs p
           |  JOIN bits ba ON ba.doc_id = p.d1
           |  JOIN bits bb ON bb.doc_id = p.d2 AND bb.k = ba.k
           |  GROUP BY 1, 2)
           |SELECT d1, d2, hamming FROM ham WHERE hamming <= 6 ORDER BY d1, d2"""
      }
    ) { (s, d) =>
      val mkGradient = udf((id: Long) => MultimodalOps.quadPatternPng(id))
      val ahash = udf { (b: Array[Byte]) =>
        ImageOps.decode(b).toOption
          .map(img => ImageOps.aHash(ImageOps.grayscale(img)))
          .orNull
      }
      val minK = udaf(new graft.functions.MinKLongsAgg(
        graft.ops.DedupOps.MaxBucketDocs))
      val hashes = Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), ahash(mkGradient(col("doc_id"))).as("ahash"))
        .localCheckpoint() // feeds bands AND both hamming ends: hash once
      val bands = hashes.select(col("doc_id"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("bi"),
              substring(col("ahash"), 1 + 4 * b, 4).as("bv"))): _*)).as("bd"))
        .select(col("doc_id"), col("bd.bi"), col("bd.bv"))
      val pairs = graft.ops.DedupOps.expandCappedBuckets(
        bands.groupBy("bi", "bv").agg(minK(col("doc_id")).as("ds")))
      // 64-bit hamming as 4 x 16-bit chunks: parse, xor, popcount — all
      // codegen'd integer ops, no UDF in the pair loop
      def chunks(h: org.apache.spark.sql.Column) = (0 until 4).map(i =>
        conv(substring(h, 1 + 4 * i, 4), 16, 10).cast("int"))
      val hamming = chunks(col("ha")).zip(chunks(col("hb")))
        .map { case (a, b) => bit_count(a.bitwiseXOR(b)) }
        .reduce(_ + _).cast("long")
      pairs
        .join(hashes.toDF("k1", "ha"), col("d1") === col("k1"))
        .join(hashes.toDF("k2", "hb"), col("d2") === col("k2"))
        .select(col("d1"), col("d2"), hamming.as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy("d1", "d2")
    },

    // Multimodal metadata: REAL header decode (format sniffed from magic
    // bytes, dims from the PNG header) over per-row generated images.
    Q(
      "q_multimodal_meta",
      """SELECT doc_id,
        |       'png' AS format,
        |       CAST(8 + doc_id % 16 AS INT) AS width,
        |       CAST(8 AS INT) AS height,
        |       true AS valid
        |FROM documents WHERE doc_id < 500 ORDER BY doc_id"""
    ) { (s, d) =>
      val mkPng = udf((w: Int) => MultimodalOps.whitePng(w, 8))
      val meta = udf((b: Array[Byte]) => MultimodalOps.imageMeta(b))
      Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), mkPng((lit(8) + col("doc_id") % 16).cast("int")).as("content"))
        .select(col("doc_id"), meta(col("content")).as("m"))
        .select(
          col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.valid").as("valid"))
        .orderBy("doc_id")
    }
  )
}
