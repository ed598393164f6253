package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ocr.{ImageOps, OcrPipeline}

/** Property-based invariants (SURVEY.md §5.2 item 3) over the pure
  * kernels — no SparkSession needed, so these run in milliseconds.
  * (The scalatest-scalacheck bridge isn't in the offline cache, so
  * sampling is driven directly with deterministic seeds.)
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val wsChar = Gen.oneOf(' ', '\t', '\n', ' ', ' ', '　')
  private val wsGen = Gen.nonEmptyListOf(wsChar).map(_.mkString)

  test("word count == number of generated words, any whitespace separator") {
    samples(Gen.zip(Gen.listOf(wordGen), wsGen)).foreach { case (words, ws) =>
      val text = words.mkString(ws)
      assert(OcrPipeline.fieldsCount(text) == words.length.toLong, s"text=$text")
    }
  }

  test("word count invariant under whitespace padding") {
    samples(Gen.zip(Gen.alphaStr, wsGen)).foreach { case (s, ws) =>
      assert(OcrPipeline.fieldsCount(ws + s + ws) == OcrPipeline.fieldsCount(s))
    }
  }

  test("word count concat additivity across a whitespace joint") {
    samples(Gen.zip(Gen.listOf(wordGen), Gen.listOf(wordGen))).foreach { case (a, b) =>
      val (sa, sb) = (a.mkString(" "), b.mkString(" "))
      assert(OcrPipeline.fieldsCount(sa + " " + sb) ==
        OcrPipeline.fieldsCount(sa) + OcrPipeline.fieldsCount(sb))
    }
  }

  test("fieldsCount parity with a direct Go strings.Fields reimplementation") {
    // unicode.IsSpace's White_Space set, spelled out (Go: unicode/tables.go)
    val goWhite: Set[Char] =
      Set('\t', '\n', '', '\f', '\r', ' ', '', ' ',
        ' ', ' ', ' ', ' ', ' ', '　') ++
        (' ' to ' ').toSet
    def goFields(s: String): Long = {
      var n = 0L
      var inWord = false
      s.foreach { c =>
        val isWs = goWhite.contains(c)
        if (!isWs && !inWord) n += 1
        inWord = !isWs
      }
      n
    }
    val anyChar = Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(goWhite.toSeq),
      1 -> Gen.asciiPrintableChar)
    samples(Gen.listOf(anyChar).map(_.mkString), 500).foreach { s =>
      assert(OcrPipeline.fieldsCount(s) == goFields(s),
        s"mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("binarize output is always exactly {0, 255}") {
    samples(Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte)))
      .foreach { p =>
        val out = ImageOps.binarize(ImageOps.Gray(p.length.max(1), 1, p))
        assert(out.pixels.forall(v => (v & 0xff) == 0 || (v & 0xff) == 255))
      }
  }

  test("binarize threshold semantics per pixel (main.go:181-185)") {
    (0 to 255).foreach { v =>
      val out = ImageOps.binarize(ImageOps.Gray(1, 1, Array(v.toByte)))
      assert((out.pixels(0) & 0xff) == (if (v < 128) 0 else 255), s"v=$v")
    }
  }

  test("luma stays in [0,255] and is monotone in each channel") {
    val ch = Gen.chooseNum(0, 255)
    samples(Gen.zip(ch, ch, ch)).foreach { case (r, g, b) =>
      val y = ImageOps.luma(r, g, b)
      assert(y >= 0 && y <= 255)
      assert(ImageOps.luma((r + 1).min(255), g, b) >= y)
      assert(ImageOps.luma(r, (g + 1).min(255), b) >= y)
      assert(ImageOps.luma(r, g, (b + 1).min(255)) >= y)
    }
  }

  test("TopKPairAgg == sort-take reference under any reduce/merge split") {
    val k = 5
    val agg = new functions.TopKPairAgg(k)
    // includes the float edge cases SQL ordering pins: NaN (greatest,
    // first under DESC), -0.0 == 0.0 (tie broken by id), infinities
    val scoreGen = Gen.frequency(
      8 -> Gen.chooseNum(-100, 100).map(_ / 7.0),
      2 -> Gen.oneOf(Double.NaN, 0.0, -0.0,
        Double.PositiveInfinity, Double.NegativeInfinity))
    val pairGen = Gen.zip(scoreGen, Gen.chooseNum(0L, 50L))
    // independent spelling of SQL "ORDER BY score DESC, id":
    // java.lang.Double.compare with -0.0 normalized away
    val sqlDescOrd = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        def n(d: Double) = if (d == 0.0) 0.0 else d
        val c = java.lang.Double.compare(n(b._1), n(a._1))
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    // NaN != NaN under ==, so equality is comparator-equivalence per slot
    def sameTopK(got: Seq[(Double, Long)], exp: Seq[(Double, Long)]): Boolean =
      got.size == exp.size &&
        got.zip(exp).forall { case (g, e) => sqlDescOrd.compare(g, e) == 0 }
    samples(Gen.zip(Gen.listOf(pairGen), Gen.chooseNum(0, 100)), 200)
      .foreach { case (pairs, splitSeed) =>
        val expected = pairs.sorted(sqlDescOrd).take(k)
        // single-buffer reduce
        val reduced = pairs.foldLeft(agg.zero)(agg.reduce)
        assert(sameTopK(agg.finish(reduced), expected), s"reduce path: $pairs")
        // arbitrary two-buffer split + merge (partial-aggregation shape)
        val cut = if (pairs.isEmpty) 0 else splitSeed % (pairs.length + 1)
        val (a, b) = pairs.splitAt(cut)
        val merged = agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        assert(sameTopK(agg.finish(merged), expected), s"merge path: $pairs at $cut")
      }
  }

  test("MinKLongsAgg == sorted-take-k under any reduce/merge split") {
    val k = 4
    val agg = new functions.MinKLongsAgg(k)
    samples(Gen.zip(Gen.listOf(Gen.chooseNum(-1000L, 1000L)),
      Gen.chooseNum(0, 100)), 200)
      .foreach { case (xs, splitSeed) =>
        val expected = xs.sorted.take(k)
        val reduced = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
        assert(reduced == expected, s"reduce path: $xs")
        val cut = if (xs.isEmpty) 0 else splitSeed % (xs.length + 1)
        val (a, b) = xs.splitAt(cut)
        val merged = agg.finish(agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
        assert(merged == expected, s"merge path: $xs at $cut")
        // the bound that makes a degenerate bucket safe: buffers never
        // exceed 2k values at any point in either path
        var buf = agg.zero
        xs.foreach { v => buf = agg.reduce(buf, v); assert(buf.length <= 2 * k) }
      }
  }

  test("minhash-style property: lexicographic min of fixed-width hex == numeric min") {
    val hexGen = Gen.listOfN(16, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
    samples(Gen.nonEmptyListOf(hexGen)).foreach { hs =>
      val lexMin = hs.min
      val numMin = hs.minBy(h => BigInt(h, 16))
      assert(BigInt(lexMin, 16) == BigInt(numMin, 16))
    }
  }

  test("WARC framing: write->parse roundtrips arbitrary payloads, incl. embedded CRLF and fake version lines") {
    import graft.sources.Warc
    // payloads drawn to ATTACK the framing: raw "\r\n\r\n" runs and
    // "WARC/1.1" strings inside the body must not desynchronize the
    // parser — Content-Length alone governs the record boundary
    val attack = Gen.oneOf("\r\n", "\r\n\r\n", "WARC/1.1\r\n", "Content-Length: 3\r\n\r\nabc")
    val chunk = Gen.oneOf(attack, Gen.asciiPrintableStr, Gen.listOf(Gen.choose(0, 0x10ffff)
      .suchThat(c => !Character.isSurrogate(c.toChar) || c > 0xffff)
      .map(Character.toChars(_).mkString)).map(_.mkString))
    val payloadGen = Gen.listOf(chunk).map(_.mkString)
    samples(Gen.zip(Gen.choose(0, 5), Gen.listOf(payloadGen)), n = 120).foreach {
      case (seed, payloads) =>
        Seq(false, true).foreach { gz =>
          val bos = new java.io.ByteArrayOutputStream()
          val recs = payloads.zipWithIndex.map { case (p, i) =>
            Warc.WarcRecord("resource", s"urn:p:$seed:$i", Some(s"https://x.invalid/$i"),
              Map("X-K" -> s"v$i"), p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          val out: java.io.OutputStream =
            if (gz) new java.util.zip.GZIPOutputStream(bos) else bos
          recs.foreach(Warc.writeRecord(out, _))
          out match { case g: java.util.zip.GZIPOutputStream => g.finish(); case _ => () }
          val got = Warc.parseStream(
            new java.io.ByteArrayInputStream(bos.toByteArray), gz).toList
          assert(got.forall(_.isRight), s"gz=$gz: ${got.find(_.isLeft)}")
          val back = got.map(_.toOption.get)
          assert(back.map(_.recordId) == recs.map(_.recordId))
          assert(back.map(_.payload.toSeq) == recs.map(_.payload.toSeq), s"gz=$gz payload drift")
        }
    }
  }
}
