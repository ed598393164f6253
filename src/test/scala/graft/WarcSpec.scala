package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ArchiveOps
import graft.sources.Warc

/** WARC source (ISO 28500): framing unit tests on the writer/parser
  * pair, the row-level error channel, and the full corpus roundtrip
  * the registered query relies on.
  */
class WarcSpec extends SparkSpec {

  private def records(dir: java.io.File, name: String): Seq[Either[String, Warc.WarcRecord]] = {
    val f = new java.io.File(dir, name)
    val in = new java.io.FileInputStream(f)
    try Warc.parseStream(in, Warc.codecOf(name)).toList
    finally in.close()
  }

  private def mkRec(id: Long, text: String): Warc.WarcRecord =
    Warc.WarcRecord("resource", s"urn:graft:doc:$id",
      Some(s"https://graft.invalid/web/$id"),
      Map("Content-Type" -> "text/plain; charset=utf-8"),
      text.getBytes(UTF_8))

  test("writer->parser roundtrip is exact for both layouts, incl. multi-byte UTF-8 and empty payloads") {
    val dir = Files.createTempDirectory("graft_warc_unit").toFile
    // "héllo → wörld" is 3 multi-byte chars: Content-Length (bytes) must
    // diverge from the char count for the roundtrip to prove anything
    val docs = Seq(mkRec(1, "plain ascii"), mkRec(2, "héllo → wörld"), mkRec(3, ""))
    Seq("u.warc" -> Warc.CodecNone, "u.warc.gz" -> Warc.CodecGzip,
        "u.warc.zst" -> Warc.CodecZstd).foreach { case (name, codec) =>
      val w = Warc.shardWriter(new java.io.File(dir, name), codec)
      docs.foreach(w.write); w.close()
      val got = records(dir, name)
      assert(got.forall(_.isRight), s"$name: unexpected parse error ${got.find(_.isLeft)}")
      val recs = got.map(_.toOption.get)
      assert(recs.head.warcType == "warcinfo") // leading warcinfo record
      val bodies = recs.tail
      assert(bodies.map(_.recordId) == docs.map(_.recordId))
      assert(bodies.map(r => new String(r.payload, UTF_8)) ==
        Seq("plain ascii", "héllo → wörld", ""))
      assert(bodies.head.targetUri.contains("https://graft.invalid/web/1"))
      assert(bodies.head.headers("Content-Type") == "text/plain; charset=utf-8")
    }
  }

  test("header obs-fold continuation lines append to the prior header") {
    val raw = ("WARC/1.1\r\nWARC-Type: resource\r\nWARC-Record-ID: urn:x:1\r\n" +
      "X-Long: part one\r\n  part two\r\nContent-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val got = Warc.parseStream(new ByteArrayInputStream(raw), gzipped = false).toList
    assert(got.length == 1 && got.head.isRight, got.toString)
    assert(got.head.toOption.get.headers("X-Long") == "part one part two")
    assert(new String(got.head.toOption.get.payload, UTF_8) == "ok")
  }

  test("malformed framing becomes one error row; prior records survive; other files unaffected") {
    val dir = Files.createTempDirectory("graft_warc_err").toFile
    val good = Warc.shardWriter(new java.io.File(dir, "part-00000.warc"), gzip = false)
    good.write(mkRec(10, "good file")); good.close()
    // one valid record, then a record whose Content-Length overruns EOF
    val corrupt = new java.io.FileOutputStream(new java.io.File(dir, "part-00001.warc"))
    Warc.writeRecord(corrupt, mkRec(20, "still fine"))
    corrupt.write("WARC/1.1\r\nWARC-Type: resource\r\nContent-Length: 9999\r\n\r\nshort".getBytes(UTF_8))
    corrupt.close()
    val df = ArchiveOps.readCorpus(spark, dir.getAbsolutePath).cache()
    try {
      assert(df.filter(col("error").isNotNull).count() == 1)
      assert(df.filter(col("error").isNotNull).head().getString(0).endsWith("part-00001.warc"))
      // both files' good records all present: 2 warcinfo + docs 10 and 20
      assert(df.filter(col("warc_type") === "resource").count() == 2)
      assert(df.filter(col("record_id") === "urn:graft:doc:20").count() == 1)
    } finally df.unpersist()
  }

  test("corpus roundtrip: every document byte-identical through sharded warc/warc.gz") {
    val dir = Files.createTempDirectory("graft_warc_corpus").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeCorpus(docs, dir, shards = 4)
    // default layout cycles gzip/plain/zstd by shard — all three present
    val names = new java.io.File(dir).list().sorted.toSeq
    assert(names.exists(_.endsWith(".warc")) && names.exists(_.endsWith(".warc.gz")) &&
      names.exists(_.endsWith(".warc.zst")), names.toString)
    val back = ArchiveOps.readCorpus(spark, dir)
      .filter(col("warc_type") === "resource")
      .select(expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
        col("text").as("rt_text"), col("lang").as("rt_lang"), col("source").as("rt_source"))
    assert(back.filter(col("error").isNotNull).count() == 0)
    val joined = docs.join(back, "doc_id")
    assert(joined.count() == docs.count()) // no doc lost or duplicated
    assert(joined.filter(col("text") =!= col("rt_text") ||
      col("lang") =!= col("rt_lang") || col("source") =!= col("rt_source")).count() == 0)
  }

  test("streaming WARC ingest: shards landing in the directory parse exactly once; errors surfaced") {
    val landing = Files.createTempDirectory("graft_warc_stream").toFile
    val ckpt = Files.createTempDirectory("graft_warc_ckpt").toFile.getAbsolutePath
    val seen = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val q = ArchiveOps.streamCorpus(spark, landing.getAbsolutePath)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("record_id", "error").collect()
          .map(r => (r.getString(0), r.getString(1)))
        seen.synchronized { seen ++= rows }
        ()
      }.start()
    try {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
      def land(lo: Long, hi: Long, tag: String): Unit = {
        val stage = Files.createTempDirectory("graft_warc_stage").toFile
        ArchiveOps.writeCorpus(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          stage.getAbsolutePath, shards = 2)
        // a fetcher lands SHARDS — not the local FS's checksum sidecars
        stage.listFiles().filter(f => !f.getName.startsWith(".")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(landing, s"$tag-${f.getName}").toPath)
        }
      }
      def docIds = seen.synchronized {
        seen.collect { case (id, null) if id != null && id.startsWith("urn:graft:doc:") =>
          id.stripPrefix("urn:graft:doc:").toLong }
      }
      land(0, 15, "b1"); q.processAllAvailable()
      assert(docIds.sorted == (0L until 15L))
      // second landing: only the NEW files are read (the checkpointed
      // source ledger, not a re-listing, decides — exactly-once)
      land(15, 30, "b2"); q.processAllAvailable()
      assert(docIds.sorted == (0L until 30L)) // no b1 record re-delivered
      // a truncated shard surfaces as an error ROW, the stream survives
      Files.write(new java.io.File(landing, "b3-part-broken.warc").toPath,
        "WARC/1.1\r\nContent-Length: 999\r\n\r\nxx".getBytes(UTF_8))
      land(30, 40, "b3"); q.processAllAvailable()
      assert(docIds.sorted == (0L until 40L))
      assert(seen.synchronized(seen.count(_._2 != null)) == 1)
      assert(q.isActive)
    } finally q.stop()
  }

  test("streaming crawl refinery: landed response shards -> extract main content -> tokenize, batch-equal") {
    // the q_crawl_ingest pipeline as a STREAM: HTML response shards land
    // in a directory, each micro-batch HTTP-decodes, extracts main
    // content, and tokenizes — accumulated totals must equal the batch
    // aggregate over the same documents (extraction composes with the
    // MicroBatchStream source exactly as with the batch scan)
    val landing = Files.createTempDirectory("graft_warc_refinery").toFile
    val ckpt = Files.createTempDirectory("graft_warc_refckpt").toFile.getAbsolutePath
    val seen = scala.collection.mutable.ArrayBuffer[(String, String, Long, Long)]()
    val q = ArchiveOps.streamCorpus(spark, landing.getAbsolutePath)
      .filter(col("http_status") === 200 &&
        col("content_type") === "text/html" && col("error").isNull)
      .select(col("source"), col("lang"),
        graft.functions.GraftFunctions.html_extract(col("text"))
          .getField("main_text").as("main"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n"),
            sum(ops.TextOps.wordCount(col("main")).cast("long")).as("tok"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        seen.synchronized { seen ++= rows }
        ()
      }.start()
    try {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), ops.HtmlOps.htmlWrapCol.as("text"),
          col("lang"), col("source"))
      def land(lo: Long, hi: Long, tag: String): Unit = {
        val stage = Files.createTempDirectory("graft_warc_refstage").toFile
        ArchiveOps.writeHttpCorpus(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          stage.getAbsolutePath, shards = 2, richVariants = true)
        stage.listFiles().filter(f => !f.getName.startsWith(".")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(landing, s"$tag-${f.getName}").toPath)
        }
      }
      land(0, 20, "b1"); q.processAllAvailable()
      land(20, 40, "b2"); q.processAllAvailable()
      val got = seen.synchronized {
        seen.groupBy(r => (r._1, r._2))
          .view.mapValues(g => (g.map(_._3).sum, g.map(_._4).sum)).toMap
      }
      val want = Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 40)
        .select(col("source"), col("lang"), ops.HtmlOps.htmlWrapCol.as("html"))
        .select(col("source"), col("lang"),
          graft.functions.GraftFunctions.html_extract(col("html"))
            .getField("main_text").as("main"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n"),
          sum(ops.TextOps.wordCount(col("main")).cast("long")).as("tok"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == want, s"streamed $got vs batch $want")
    } finally q.stop()
  }

  test("streaming WARC restart: the checkpointed offset log resumes without re-delivery") {
    // deserializeOffset runs only on RESTART — a fresh query on the same
    // checkpoint must resume from the logged file-set, reading neither
    // the already-consumed shards again nor missing the new ones
    val landing = Files.createTempDirectory("graft_warc_restart").toFile
    val ckpt = Files.createTempDirectory("graft_warc_rckpt").toFile.getAbsolutePath
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    def land(lo: Long, hi: Long, tag: String): Unit = {
      val stage = Files.createTempDirectory("graft_warc_rstage").toFile
      ArchiveOps.writeCorpus(
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
        stage.getAbsolutePath, shards = 2)
      stage.listFiles().filter(f => !f.getName.startsWith(".")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new java.io.File(landing, s"$tag-${f.getName}").toPath)
      }
    }
    def start() = ArchiveOps.streamCorpus(spark, landing.getAbsolutePath)
      .filter(col("warc_type") === "resource")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = batch.select("record_id").collect().map(_.getString(0))
        seen.synchronized { seen ++= ids }
        ()
      }.start()
    val q1 = start()
    try { land(0, 12, "b1"); q1.processAllAvailable() } finally q1.stop()
    assert(seen.synchronized(seen.size) == 12)
    // files land WHILE no query is running; the restarted query must
    // pick up exactly the delta
    land(12, 20, "b2")
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val ids = seen.synchronized(seen.toVector)
    assert(ids.size == 20, s"expected 20 total, got ${ids.size}")
    assert(ids.distinct.size == 20, "a shard was re-delivered after restart")
  }

  test("avro container roundtrip: stream decode recovers every document; schema read from file header") {
    val dir = Files.createTempDirectory("graft_avro_corpus").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeAvroCorpus(docs, dir, shards = 4)
    val files = new java.io.File(dir).list().filter(_.endsWith(".avro"))
    assert(files.length == 4, files.toSeq.toString)
    val back = ArchiveOps.readAvroCorpus(spark, dir)
      .withColumnRenamed("text", "rt_text")
      .withColumnRenamed("lang", "rt_lang")
      .withColumnRenamed("source", "rt_source")
    val joined = docs.join(back, "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter(col("text") =!= col("rt_text") ||
      col("lang") =!= col("rt_lang") || col("source") =!= col("rt_source")).count() == 0)
  }

  test("streaming Avro ingest: containers landing in the directory decode exactly once") {
    val landing = Files.createTempDirectory("graft_avro_stream").toFile
    val ckpt = Files.createTempDirectory("graft_avro_ckpt").toFile.getAbsolutePath
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = ArchiveOps.streamAvroCorpus(spark, landing.getAbsolutePath)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = batch.select("doc_id").collect().map(_.getLong(0))
        seen.synchronized { seen ++= ids }
        ()
      }.start()
    try {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
      def land(lo: Long, hi: Long, tag: String): Unit = {
        val stage = Files.createTempDirectory("graft_avro_stage").toFile
        ArchiveOps.writeAvroCorpus(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          stage.getAbsolutePath, shards = 2)
        stage.listFiles().foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(landing, s"$tag-${f.getName}").toPath)
        }
      }
      land(0, 15, "b1"); q.processAllAvailable()
      assert(seen.synchronized(seen.sorted.toSeq) == (0L until 15L))
      land(15, 30, "b2"); q.processAllAvailable()
      assert(seen.synchronized(seen.sorted.toSeq) == (0L until 30L)) // no re-delivery
    } finally q.stop()
  }

  test("q_avro_roundtrip aggregates one group per lang") {
    val df = SparkEntry.queries("q_avro_roundtrip")(spark, sfDir)
    val rows = df.collect()
    val nLangs = Tables.documents(spark, sfDir).select("lang").distinct().count()
    assert(rows.length == nLangs)
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sfDir).count())
  }

  test("decode failures land in the error channel, never as exceptions") {
    // empty .gz: clean zero-record parse (a fetcher touched the file
    // and died before writing anything)
    assert(Warc.parseStream(new ByteArrayInputStream(Array.emptyByteArray), gzipped = true).toList.isEmpty)
    assert(Warc.parseStream(new ByteArrayInputStream(Array.emptyByteArray), gzipped = false).toList.isEmpty)
    // corrupt compressed bytes: one error row, no throw (both codecs)
    val garbage = Warc.parseStream(
      new ByteArrayInputStream("this is not gzip at all".getBytes(UTF_8)), gzipped = true).toList
    assert(garbage.length == 1 && garbage.head.isLeft, garbage.toString)
    val zgarbage = Warc.parseStream(
      new ByteArrayInputStream("this is not zstd either!".getBytes(UTF_8)), Warc.CodecZstd).toList
    assert(zgarbage.length == 1 && zgarbage.head.isLeft, zgarbage.toString)
    assert(Warc.parseStream(new ByteArrayInputStream(Array.emptyByteArray), Warc.CodecZstd).toList.isEmpty)
    // binary garbage with no LF anywhere: the header-line cap turns it
    // into one cheap error row instead of buffering the whole "file"
    val noLf = Array.fill(Warc.MaxHeaderLineBytes + 512)('x'.toByte)
    val capped = Warc.parseStream(new ByteArrayInputStream(noLf), gzipped = false).toList
    assert(capped.length == 1 && capped.head.isLeft, capped.take(1).toString)
    assert(capped.head.swap.toOption.get.contains("header line exceeds"))
  }

  test("GZIPInputStream member-boundary: records survive a source whose available() is always 0") {
    // Hadoop streams report available()==0 at member boundaries; the
    // peeking wrapper must keep the concatenated-member reader going
    // build a many-member concatenation through the real writer path
    val tmp = Files.createTempDirectory("graft_gz_avail").toFile
    val f = new java.io.File(tmp, "m.warc.gz")
    val sw = Warc.shardWriter(f, gzip = true)
    (1 to 25).foreach(i => sw.write(mkRec(i.toLong, s"record number $i")))
    sw.close()
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val zeroAvail = new java.io.InputStream {
      private val in = new ByteArrayInputStream(bytes)
      def read(): Int = in.read()
      override def read(b: Array[Byte], o: Int, l: Int): Int = in.read(b, o, l)
      override def available(): Int = 0 // the HDFS/S3 behavior
    }
    val got = Warc.parseStream(zeroAvail, gzipped = true).toList
    assert(got.forall(_.isRight), got.find(_.isLeft).toString)
    assert(got.count(_.toOption.get.warcType == "resource") == 25)
  }

  test("oversized Content-Length is skipped as one error row; later records still parse") {
    val bos = new java.io.ByteArrayOutputStream()
    Warc.writeRecord(bos, mkRec(1, "before"))
    Warc.writeRecord(bos, mkRec(2, "a payload past the buffer cap"))
    Warc.writeRecord(bos, mkRec(3, "after"))
    val got = Warc.parseStream(new ByteArrayInputStream(bos.toByteArray),
      gzipped = false, maxBufferedPayload = 16L).toList
    assert(got.length == 3, got.toString)
    assert(got(0).isRight && new String(got(0).toOption.get.payload, UTF_8) == "before")
    assert(got(1).isLeft && got(1).swap.toOption.get.contains("too large"), got(1).toString)
    assert(got(2).isRight && new String(got(2).toOption.get.payload, UTF_8) == "after")
  }

  test("writer rejects header names that could forge or corrupt framing") {
    val out = new java.io.ByteArrayOutputStream()
    def rec(h: Map[String, String]) = mkRec(1, "x").copy(headers = h)
    intercept[IllegalArgumentException] {
      Warc.writeRecord(out, rec(Map("content-length" -> "0")))
    }
    intercept[IllegalArgumentException] {
      Warc.writeRecord(out, rec(Map("Bad:Name" -> "v")))
    }
    intercept[IllegalArgumentException] {
      Warc.writeRecord(out, rec(Map(" folded" -> "v")))
    }
    intercept[IllegalArgumentException] {
      Warc.writeRecord(out, rec(Map("X-Ok" -> "evil\r\nInjected: yes")))
    }
  }

  test("fetchRecords flags a stale index as an error row instead of serving the wrong record") {
    val dir = Files.createTempDirectory("graft_warc_stale").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    val idx = ArchiveOps.writeIndexedCorpus(docs, dir, shards = 2).collect()
    // pretend the corpus was regenerated: one entry now claims a span
    // that actually holds a different record
    import spark.implicits._
    val tampered = idx.toSeq.zipWithIndex.map { case (e, i) =>
      if (i == 0) e.copy(record_id = "urn:graft:doc:999999") else e
    }.toDF()
    val fetched = ArchiveOps.fetchRecords(tampered).cache()
    try {
      val bad = fetched.filter(col("error").isNotNull).collect()
      assert(bad.length == 1, bad.mkString(";"))
      assert(bad.head.getAs[String]("error").contains("index mismatch"), bad.head.toString)
      assert(fetched.filter(col("error").isNull).count() == idx.length - 1)
    } finally fetched.unpersist()
  }

  test("CDX index: every member span fetches standalone and matches the source row") {
    val dir = Files.createTempDirectory("graft_warc_cdx_t").toFile.getAbsolutePath
    val idxDir = Files.createTempDirectory("graft_warc_cdx_i").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeIndexedCorpus(docs, dir, shards = 4)
      .write.mode("overwrite").parquet(idxDir)
    val index = spark.read.parquet(idxDir).cache()
    try {
      // one entry per record, warcinfo INCLUDED (the index-assisted
      // lookup contract: absent from the index == absent from the corpus)
      assert(index.count() == docs.count() + 4)
      index.collect().groupBy(_.getString(1)).foreach { case (p, rows) =>
        val spans = rows.map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
          .sortBy(_._2)
        // the leading warcinfo member is indexed at offset 0; doc spans
        // all start past it; spans are disjoint
        assert(spans.head._1.startsWith("urn:graft:warcinfo:") && spans.head._2 == 0L,
          s"$p: first span is not the warcinfo member: ${spans.head}")
        assert(spans.tail.forall(s => s._1.startsWith("urn:graft:doc:") && s._2 > 0), p)
        spans.map(s => (s._2, s._3)).sliding(2).foreach {
          case Array((o1, l1), (o2, _)) => assert(o1 + l1 <= o2, s"$p: overlapping spans")
          case _ => ()
        }
      }
      // every record fetches standalone, byte-identical to the source
      val fetched = ArchiveOps.fetchRecords(index)
        .select(expr("try_cast(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
          col("text").as("rt_text"), col("error"))
      assert(fetched.filter(col("error").isNotNull).count() == 0)
      val joined = docs.join(fetched, "doc_id")
      assert(joined.count() == docs.count())
      assert(joined.filter(col("text") =!= col("rt_text")).count() == 0)
    } finally index.unpersist()
  }

  test("q_warc_fetch returns exactly the requested subset") {
    val df = SparkEntry.queries("q_warc_fetch")(spark, sfDir)
    val rows = df.collect()
    val expect = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 37 === 0).count()
    assert(rows.length == expect && rows.nonEmpty)
    assert(rows.map(_.getLong(0)).forall(_ % 37 == 0))
  }

  test(".warc.zst dictionary frame is written with the IIPC dictionary magic 0x184D2A5D") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    val dict = ArchiveOps.trainedZstdDict(docs)
    assert(dict.nonEmpty)
    val dir = Files.createTempDirectory("graft_zstd_magic").toFile.getAbsolutePath
    ArchiveOps.writeCorpus(docs.limit(20), dir, shards = 1,
      codec = Some(Warc.CodecZstd), zstdDict = dict)
    val shard = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.zst")).head
    val head = new Array[Byte](4)
    val in = new java.io.FileInputStream(shard)
    try assert(in.read(head) == 4) finally in.close()
    val magic = (head(0) & 0xffL) | ((head(1) & 0xffL) << 8) |
      ((head(2) & 0xffL) << 16) | ((head(3) & 0xffL) << 24)
    // spec-literal third-party tools key the dictionary off this exact
    // magic; the generic skippable 0x184D2A50 is not enough
    assert(magic == 0x184D2A5DL, f"magic 0x$magic%08X != 0x184D2A5D")
  }

  test(".warc.zst dictionary frame: trained dict shrinks shards; every read path decodes it") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    val dict = ArchiveOps.trainedZstdDict(docs)
    assert(dict.nonEmpty, "fixture text should train a dictionary")
    val plainDir = Files.createTempDirectory("graft_zstd_plain").toFile.getAbsolutePath
    val dictDir = Files.createTempDirectory("graft_zstd_dict").toFile.getAbsolutePath
    ArchiveOps.writeCorpus(docs, plainDir, shards = 2, codec = Some(Warc.CodecZstd))
    ArchiveOps.writeCorpusWithIndex(docs, dictDir, shards = 2,
      codec = Some(Warc.CodecZstd), zstdDict = dict)
    def bytesOf(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".warc.zst")).map(_.length()).sum
    // per-record frames share no history: the shared dictionary must
    // beat dictionary-less zstd even after paying its own frame bytes
    assert(bytesOf(dictDir) < bytesOf(plainDir),
      s"dict ${bytesOf(dictDir)} !< plain ${bytesOf(plainDir)}")
    info(f"dict shards ${bytesOf(dictDir)} B vs plain zstd ${bytesOf(plainDir)} B " +
      f"(${bytesOf(dictDir).toDouble / bytesOf(plainDir)}%.3f of dictionary-less)")
    // bulk read (in-stream dictionary detection)
    val back = ArchiveOps.readCorpus(spark, dictDir)
      .filter(col("warc_type") === "resource")
      .select(expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
        col("text").as("rt_text"))
    val joined = docs.join(back, "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter(col("text") =!= col("rt_text")).count() == 0)
    // CDX seek path (file-head dictionary loaded once per file)
    val idx = spark.read.parquet(s"$dictDir/_cdx")
    val fetched = ArchiveOps.fetchRecords(idx)
    assert(fetched.filter(col("error").isNotNull).count() == 0)
    assert(fetched.count() == idx.count())
    // DSv2 full scan + DSv2 index-seek over the dict corpus
    val ds = spark.read.format("warc").load(dictDir)
      .filter(col("warc_type") === "resource")
    assert(ds.count() == docs.count())
    val one = spark.read.format("warc").load(dictDir)
      .filter(col("record_id") === "urn:graft:doc:1")
      .select("text").collect()
    assert(one.length == 1 &&
      one.head.getString(0) == docs.filter(col("doc_id") === 1L).head().getString(1))
  }

  test(".warc.zst dictionary frame: a zstd-COMPRESSED dictionary payload also reads") {
    // the IIPC spec allows the skippable frame to carry the dictionary
    // itself zstd-compressed — synthesize that layout by hand
    val docs = Seq(mkRec(1, "shared prefix alpha"), mkRec(2, "shared prefix beta"))
    val dictRaw = ("shared prefix " * 800).getBytes(UTF_8).take(4096)
    val bos = new java.io.ByteArrayOutputStream()
    // skippable frame with a compressed dictionary payload
    val zdict = com.github.luben.zstd.Zstd.compress(dictRaw)
    def le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    bos.write(le(0x184D2A5D)); bos.write(le(zdict.length)); bos.write(zdict)
    val zctx = new com.github.luben.zstd.ZstdCompressCtx().setLevel(3)
    zctx.loadDict(dictRaw)
    docs.foreach { r =>
      val rec = new java.io.ByteArrayOutputStream()
      Warc.writeRecord(rec, r)
      bos.write(zctx.compress(rec.toByteArray))
    }
    val got = Warc.parseStream(
      new ByteArrayInputStream(bos.toByteArray), Warc.CodecZstd).toList
    assert(got.forall(_.isRight), got.find(_.isLeft).toString)
    assert(got.map(_.toOption.get.recordId) == Seq("urn:graft:doc:1", "urn:graft:doc:2"))
  }

  test("q_warc_zstd_dict aggregates one group per source") {
    val df = SparkEntry.queries("q_warc_zstd_dict")(spark, sfDir)
    val rows = df.collect()
    val nSources = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(rows.length == nSources)
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sfDir).count())
  }

  test("HTTP response corpus: RDD reader surfaces status/content_type and gated bodies") {
    val dir = Files.createTempDirectory("graft_warc_httpr").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeHttpCorpus(docs, dir, shards = 3)
    val back = ArchiveOps.readCorpus(spark, dir).cache()
    try {
      // every document decodes byte-identically through its wire variant
      // (charset cycle + chunked + gzip)
      val ok = back.filter(col("http_status") === 200 &&
        col("content_type") === "text/html" && col("error").isNull)
        .select(expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
          col("text").as("rt_text"))
      val joined = docs.join(ok, "doc_id")
      assert(joined.count() == docs.count())
      assert(joined.filter(col("text") =!= col("rt_text")).count() == 0)
      // the gate-out records: 404 (status), image/gif (non-text -> null
      // text, NOT an error), unknown charset (error channel)
      assert(back.filter(col("http_status") === 404).count() == 3)
      val gif = back.filter(col("content_type") === "image/gif").collect()
      assert(gif.length == 3 &&
        gif.forall(r => r.getAs[String]("text") == null && r.getAs[String]("error") == null))
      val bad = back.filter(col("error").isNotNull).collect()
      assert(bad.length == 3 && bad.forall(_.getAs[String]("error").contains("charset")))
      // resource-record behavior unchanged: null status, header-level mime
      val wi = back.filter(col("warc_type") === "warcinfo").collect()
      assert(wi.length == 3 && wi.forall(r => r.getAs[Any]("http_status") == null))
    } finally { back.unpersist(); () }
  }

  test("q_warc_roundtrip aggregates one group per source") {
    val df = SparkEntry.queries("q_warc_roundtrip")(spark, sfDir)
    val rows = df.collect()
    val nSources = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(rows.length == nSources)
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sfDir).count())
  }
}
