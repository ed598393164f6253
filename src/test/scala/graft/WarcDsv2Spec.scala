package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.ops.ArchiveOps
import graft.sources.warc.WarcScan

/** DataSourceV2 WARC connector: parity with the RDD reader, and the
  * two Catalyst integrations it adds — column pruning that skips
  * payload decode, and header-level filter pushdown — asserted on the
  * PLANNED scan, not just on values.
  */
class WarcDsv2Spec extends SparkSpec {

  private lazy val corpusDir: String = {
    val dir = Files.createTempDirectory("graft_dsv2").toFile.getAbsolutePath
    ArchiveOps.writeCorpus(
      Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source"),
      dir, shards = 4)
    dir
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): WarcScan =
    df.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[WarcScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("format(\"warc\") parity with the RDD reader on every column") {
    val ds = spark.read.format("warc").load(corpusDir)
      .withColumnRenamed("path", "p2") // paths differ in scheme (file:)
    val rdd = ArchiveOps.readCorpus(spark, corpusDir).drop("path")
    assert(ds.count() == rdd.count())
    val a = ds.drop("p2").orderBy("record_id").collect()
    val b = rdd.orderBy("record_id").collect()
    assert(a.sameElements(b))
  }

  test("column pruning reaches the scan: no-text projection reads headers only") {
    val df = spark.read.format("warc").load(corpusDir).select("lang", "source")
    val scan = scanOf(df)
    assert(!scan.readSchema().fieldNames.contains("text"), scan.description())
    // values still correct through the payload-skip path
    val got = df.filter(col("lang").isNotNull).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.documents(spark, sfDir).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("EqualTo on header columns is pushed; text predicates stay with Spark") {
    val df = spark.read.format("warc").load(corpusDir)
      .filter(col("source") === "src1" && col("warc_type") === "resource" &&
        col("text").isNotNull)
    val scan = scanOf(df)
    val pushedCols = scan.pushed.map(_.references.head).toSet
    assert(pushedCols == Set("source", "warc_type"), scan.description())
    val n = df.count()
    val want = Tables.documents(spark, sfDir).filter(col("source") === "src1").count()
    assert(n == want && n > 0)
  }

  test("a pushed filter excludes error rows (null header semantics)") {
    val dir = Files.createTempDirectory("graft_dsv2_err").toFile
    java.nio.file.Files.write(new java.io.File(dir, "bad.warc").toPath,
      "WARC/1.1\r\nContent-Length: 999\r\n\r\nx".getBytes("UTF-8"))
    val all = spark.read.format("warc").load(dir.getAbsolutePath)
    assert(all.filter(col("error").isNotNull).count() == 1)
    val filtered = spark.read.format("warc").load(dir.getAbsolutePath)
      .filter(col("warc_type") === "resource")
    assert(filtered.count() == 0) // the error row never matches an EqualTo
  }

  test("In on a header column is pushed with SQL null semantics") {
    val df = spark.read.format("warc").load(corpusDir)
      .filter(col("source").isin("src1", "src3"))
    val scan = scanOf(df)
    assert(scan.pushed.length == 1 && scan.pushed.head.isInstanceOf[org.apache.spark.sql.sources.In],
      scan.description())
    val want = Tables.documents(spark, sfDir)
      .filter(col("source").isin("src1", "src3")).count()
    assert(df.count() == want && want > 0) // warcinfo rows (null source) excluded
  }

  test("DSv2 write: df.write.format(\"warc\") commits shards atomically; roundtrips") {
    val dir = Files.createTempDirectory("graft_dsv2_w").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    docs.repartition(3).write.format("warc").mode("append")
      .option("codec", "zstd").save(dir)
    // ignore the local ChecksumFileSystem's hidden .crc sidecars — the
    // same artifact every built-in sink leaves on file:/ (scan globs
    // exclude hidden files)
    val names = new java.io.File(dir).list().sorted.toSeq.filterNot(_.startsWith("."))
    assert(names.nonEmpty && names.forall(_.endsWith(".warc.zst")), names.toString)
    assert(!names.exists(_.contains("tmp")), s"uncommitted temp left behind: $names")
    // job-unique shard names: a second append can never rename onto an
    // existing shard
    assert(names.forall(_.matches("part-\\d{5}-[0-9a-f-]+\\.warc\\.zst")), names.toString)
    val back = ArchiveOps.readCorpus(spark, dir)
      .filter(col("warc_type") === "resource")
      .select(expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
        col("text").as("rt_text"))
    val joined = docs.join(back, "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter(col("text") =!= col("rt_text")).count() == 0)
  }

  test("DSv2 write rejects a frame without the corpus columns and unknown codecs") {
    val dir = Files.createTempDirectory("graft_dsv2_bad").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir)
    intercept[Exception] {
      docs.select("doc_id", "text").write.format("warc").mode("append").save(dir)
    }
    intercept[Exception] {
      docs.select("doc_id", "text", "lang", "source")
        .write.format("warc").mode("append").option("codec", "lz4").save(dir)
    }
  }

  test("DSv2 write abort: a failed job publishes nothing (no visible shard, no temp)") {
    val dir = Files.createTempDirectory("graft_dsv2_abort").toFile
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
      // poison one row so a task fails mid-write AFTER others started
      .withColumn("text",
        when(col("doc_id") === 7L, lit(null: String)).otherwise(col("text")))
    intercept[Exception] {
      docs.repartition(4).write.format("warc").mode("append").save(dir.getAbsolutePath)
    }
    val left = Option(dir.list()).map(_.toSeq).getOrElse(Seq.empty)
    assert(!left.exists(_.contains(".warc")), s"aborted write left a visible shard: $left")
  }

  test("IsNotNull and StringStartsWith(target_uri) are pushed (the CDX prefix-scan shape)") {
    val df = spark.read.format("warc").load(corpusDir)
      .filter(col("lang").isNotNull && col("target_uri").startsWith("https://graft.invalid/src1/"))
    val scan = scanOf(df)
    val kinds = scan.pushed.map(_.getClass.getSimpleName).toSet
    assert(kinds == Set("IsNotNull", "StringStartsWith"), scan.description())
    val want = Tables.documents(spark, sfDir).filter(col("source") === "src1").count()
    assert(df.count() == want && want > 0)
  }

  test("pushed predicates are evaluated against an error row's ACTUAL values") {
    // an error row is (path, error) with every other column null:
    // path-anchored filters must return it WITH pushdown, null-column
    // equalities must not — result can never depend on whether pushdown
    // fired (r11 dropped ALL error rows whenever any filter was pushed)
    val dir = Files.createTempDirectory("graft_dsv2_errp").toFile
    java.nio.file.Files.write(new java.io.File(dir, "bad.warc").toPath,
      "WARC/1.1\r\nContent-Length: 999\r\n\r\nx".getBytes("UTF-8"))
    val d = dir.getAbsolutePath
    val errPath = spark.read.format("warc").load(d)
      .select("path").collect().head.getString(0)
    def q() = spark.read.format("warc").load(d)
    // path EqualTo: pushed, and the error row still surfaces
    val byPath = q().filter(col("path") === errPath)
    assert(scanOf(byPath).pushed.nonEmpty)
    assert(byPath.count() == 1 && byPath.head().getAs[String]("error") != null)
    // path IsNotNull: pushed, error row surfaces (path is never null)
    val notNull = q().filter(col("path").isNotNull)
    assert(scanOf(notNull).pushed.nonEmpty && notNull.count() == 1)
    // record_id EqualTo: null on the error row -> excluded
    assert(q().filter(col("record_id") === "urn:x:1").count() == 0)
  }

  test("http_status/content_type predicates push into the scan") {
    val dir = Files.createTempDirectory("graft_dsv2_http").toFile.getAbsolutePath
    ArchiveOps.writeHttpCorpus(
      Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source"),
      dir, shards = 4)
    val df = spark.read.format("warc").load(dir)
      .filter(col("http_status") === 200 && col("content_type") === "text/html")
    val scan = scanOf(df)
    assert(scan.pushed.map(_.references.head).toSet == Set("http_status", "content_type"),
      scan.description())
    // every document (incl. chunked/gzip/multi-charset variants) passes;
    // the 404 / image/gif gate-out records per shard do not
    assert(df.count() ==
      Tables.documents(spark, sfDir).count() + 4 /* shards: badcs rows pass both preds */)
    assert(df.filter(col("error").isNotNull).count() == 4) // the badcs rows
    // In on http_status (Integer literals) is pushed too
    val in = spark.read.format("warc").load(dir)
      .filter(col("http_status").isin(404, 500))
    assert(scanOf(in).pushed.length == 1)
    assert(in.count() == 4) // one 404 per shard
  }

  test("CDX-assisted scan: record_id-pinned read plans seek partitions == touched shards") {
    val dir = Files.createTempDirectory("graft_dsv2_cdx").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeCorpusWithIndex(docs, dir, shards = 4)
    // ids in two specific shards (doc_id % 4 picks the shard)
    val ids = Seq(0L, 4L, 8L, 1L).map(i => s"urn:graft:doc:$i")
    val df = spark.read.format("warc").load(dir)
      .filter(col("record_id").isin(ids: _*))
      .select("record_id", "text", "lang")
    val scan = scanOf(df)
    val parts = scan.planInputPartitions()
    assert(parts.forall(_.isInstanceOf[graft.sources.warc.WarcSeekPartition]),
      parts.mkString(";"))
    // ids live in shards 0 and 1 -> exactly 2 touched files
    assert(parts.length == 2, parts.mkString(";"))
    assert(parts.map(_.asInstanceOf[graft.sources.warc.WarcSeekPartition].spans.length).sum == 4)
    // values match the source table
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = docs.filter(col("doc_id").isin(0L, 4L, 8L, 1L))
      .collect().map(r => s"urn:graft:doc:${r.getLong(0)}" -> r.getString(1)).toMap
    assert(got == want)
    // an id absent from the corpus simply returns no row (index-complete)
    assert(spark.read.format("warc").load(dir)
      .filter(col("record_id") === "urn:graft:doc:99999999").count() == 0)
    // without the sidecar the same filter full-scans (no seek partitions)
    val noIdx = Files.createTempDirectory("graft_dsv2_noidx").toFile.getAbsolutePath
    ArchiveOps.writeCorpus(docs, noIdx, shards = 4)
    val fullParts = scanOf(spark.read.format("warc").load(noIdx)
      .filter(col("record_id") === ids.head)).planInputPartitions()
    assert(fullParts.forall(_.isInstanceOf[graft.sources.warc.WarcInputPartition]) &&
      fullParts.length == 4)
  }

  test("CDX-assisted scan: a stale index surfaces an error row carrying the requested id") {
    val dir = Files.createTempDirectory("graft_dsv2_stale").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeCorpusWithIndex(docs, dir, shards = 2)
    // tamper the sidecar: claim a span for an id it does not hold
    val idx = spark.read.parquet(s"$dir/_cdx")
    val tampered = idx.withColumn("record_id",
      when(col("record_id") === "urn:graft:doc:0", lit("urn:graft:doc:424242"))
        .otherwise(col("record_id")))
    tampered.write.mode("overwrite").parquet(s"$dir/_cdx_new")
    // swap sidecars (overwrite-in-place of a path being read is unsafe)
    val fs = new java.io.File(dir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(fs, "_cdx"))
    assert(new java.io.File(fs, "_cdx_new").renameTo(new java.io.File(fs, "_cdx")))
    val got = spark.read.format("warc").load(dir)
      .filter(col("record_id") === "urn:graft:doc:424242")
      .select("record_id", "error").collect()
    assert(got.length == 1, got.mkString(";"))
    assert(got.head.getString(0) == "urn:graft:doc:424242")
    assert(got.head.getString(1) != null && got.head.getString(1).contains("index mismatch"),
      got.head.toString)
  }

  test("readers use the SESSION Hadoop conf (runtime fs scheme resolves on executors)") {
    // register a filesystem SCHEME only on the session's runtime conf —
    // resolvable only if the executor-side reader uses the driver's
    // broadcast conf; `new Configuration()` (the r11 bug) cannot see it
    spark.sparkContext.hadoopConfiguration.set("fs.graftmarker.impl",
      classOf[MarkerFileSystem].getName)
    // the FileSystem CACHE ignores conf on a hit — disable it for this
    // scheme so every resolution must come from the conf that reaches
    // the call site (otherwise a driver-side resolution would mask an
    // executor-side `new Configuration()` regression)
    spark.sparkContext.hadoopConfiguration.set("fs.graftmarker.impl.disable.cache", "true")
    val dir = Files.createTempDirectory("graft_dsv2_conf").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeCorpus(docs, dir, shards = 2, codec = Some("gzip"))
    val viaMarker = spark.read.format("warc").load(s"graftmarker:$dir")
      .filter(col("warc_type") === "resource")
    assert(viaMarker.count() == docs.count())
    // the write path and fetchRecords ship the conf too
    val wdir = Files.createTempDirectory("graft_dsv2_confw").toFile.getAbsolutePath
    docs.limit(10).repartition(2).write.format("warc").mode("append")
      .save(s"graftmarker:$wdir")
    assert(ArchiveOps.readCorpus(spark, wdir)
      .filter(col("warc_type") === "resource").count() == 10)
    import spark.implicits._
    val idx = ArchiveOps.writeIndexedCorpus(docs.limit(5),
      Files.createTempDirectory("graft_dsv2_conff").toFile.getAbsolutePath, shards = 1)
      .collect().toSeq.toDF()
      .withColumn("path", regexp_replace(col("path"), "^file:", "graftmarker:"))
    val fetched = ArchiveOps.fetchRecords(idx)
    assert(fetched.filter(col("error").isNotNull).count() == 0)
    assert(fetched.count() == idx.count())
  }

  test("two append jobs to one directory: job-unique names, union read back") {
    val dir = Files.createTempDirectory("graft_dsv2_app2").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    val a = docs.filter(col("doc_id") < 10)
    val b = docs.filter(col("doc_id") >= 10 && col("doc_id") < 25)
    a.repartition(2).write.format("warc").mode("append").save(dir)
    b.repartition(2).write.format("warc").mode("append").save(dir)
    val names = new java.io.File(dir).list().filterNot(_.startsWith(".")).toSeq
    assert(names.size == names.distinct.size && names.nonEmpty)
    // the second job renamed NEW shards in — nothing overwritten
    val back = ArchiveOps.readCorpus(spark, dir).filter(col("warc_type") === "resource")
    assert(back.count() == 25)
    assert(back.select("record_id").distinct().count() == 25)
  }

  test("append to an indexed corpus drops the stale _cdx so pinned scans stay correct") {
    val dir = Files.createTempDirectory("graft_dsv2_stale_cdx").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeCorpusWithIndex(docs.filter(col("doc_id") < 10), dir, shards = 2)
    assert(new java.io.File(dir, "_cdx").exists())
    // DSv2 append: new shards the sidecar knows nothing about
    docs.filter(col("doc_id") >= 10 && col("doc_id") < 15)
      .repartition(1).write.format("warc").mode("append").save(dir)
    // the stale index must be gone — "absent from the index" would have
    // meant "absent from the corpus" for a record_id-pinned seek scan
    assert(!new java.io.File(dir, "_cdx").exists())
    val appendedId = "urn:graft:doc:12"
    val hit = spark.read.format("warc").load(dir)
      .filter(col("record_id") === appendedId)
    assert(hit.count() == 1, "pinned scan must see appended records after the append")
  }

  test("DSv2 write validates doc_id: null values and non-LONG frames are rejected") {
    val dir = Files.createTempDirectory("graft_dsv2_docid").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    intercept[Exception] { // null doc_id must never forge urn:graft:doc:0
      docs.withColumn("doc_id",
        when(col("doc_id") === 3L, lit(null: java.lang.Long)).otherwise(col("doc_id")))
        .write.format("warc").mode("append").save(dir)
    }
    intercept[Exception] { // doc_id must be LONG, not string
      docs.withColumn("doc_id", col("doc_id").cast("string"))
        .write.format("warc").mode("append").save(dir)
    }
  }

  test("limit pushdown: the reader stops parsing its shard after `limit` rows") {
    val df = spark.read.format("warc").load(corpusDir).limit(3)
    val scan = scanOf(df)
    assert(scan.limit == 3, scan.description())
    assert(df.count() == 3)
    // source-level proof of early stop: drive ONE partition reader by
    // hand — it must emit exactly `limit` rows, not the whole shard
    val parts = scan.planInputPartitions()
    val reader = scan.createReaderFactory().createReader(parts.head)
    var n = 0
    while (reader.next()) n += 1
    reader.close()
    assert(n == 3, s"reader emitted $n rows, limit was 3")
    // without a limit the same partition yields the full shard
    val noLimit = scanOf(spark.read.format("warc").load(corpusDir))
    val full = noLimit.createReaderFactory().createReader(parts.head)
    var m = 0
    while (full.next()) m += 1
    full.close()
    assert(m > 3)
  }

  test("reported statistics: conservative size feeds the broadcast decision") {
    val scan = scanOf(spark.read.format("warc").load(corpusDir))
    val stats = scan.estimateStatistics()
    val rawBytes = new java.io.File(corpusDir).listFiles()
      .filter(f => f.getName.contains(".warc") && !f.getName.endsWith(".crc"))
      .map(_.length()).sum
    // at least the on-disk bytes (compressed shards scaled up, never down)
    assert(stats.sizeInBytes().getAsLong >= rawBytes)
    // a text-pruned projection reports a smaller scan
    val pruned = scanOf(spark.read.format("warc").load(corpusDir).select("lang", "source"))
    assert(pruned.estimateStatistics().sizeInBytes().getAsLong <
      stats.sizeInBytes().getAsLong)
    // with a _cdx sidecar the row count is EXACT (footer catalog, no job)
    val idxDir = Files.createTempDirectory("graft_dsv2_stats").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeCorpusWithIndex(docs, idxDir, shards = 2)
    val withIdx = scanOf(spark.read.format("warc").load(idxDir)).estimateStatistics()
    assert(withIdx.numRows().getAsLong == docs.count() + 2) // + 2 warcinfo records
    // no sidecar -> no row claim
    assert(!stats.numRows().isPresent)
    // the planner can SEE the small corpus: a join against the fact
    // table broadcasts the warc side instead of shuffling it
    val warcSide = spark.read.format("warc").load(corpusDir)
      .filter(col("warc_type") === "resource")
      .select(expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
        col("lang").as("w_lang"))
    val joined = Tables.documents(spark, sfDir).join(warcSide, "doc_id")
    val hasBroadcast = joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast, joined.queryExecution.executedPlan.toString.take(2000))
    assert(joined.count() == Tables.documents(spark, sfDir).count())
  }

  test("runtime filtering: a join-delivered In(record_id) re-plans into index seeks") {
    val dir = Files.createTempDirectory("graft_dsv2_rtf").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeCorpusWithIndex(docs, dir, shards = 4)
    // unit level: the scan accepts a runtime In and plans SEEK partitions
    val scan = scanOf(spark.read.format("warc").load(dir).select("record_id", "text"))
    assert(scan.filterAttributes().map(_.describe()).contains("record_id"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("record_id",
        Array("urn:graft:doc:2", "urn:graft:doc:6"))))
    val parts = scan.planInputPartitions()
    assert(parts.forall(_.isInstanceOf[graft.sources.warc.WarcSeekPartition]), parts.mkString(";"))
    assert(parts.map(_.asInstanceOf[graft.sources.warc.WarcSeekPartition].spans.length).sum == 2)
    // and the readers honor it: only the two requested records come back
    val rf = scan.createReaderFactory()
    val got = parts.flatMap { p =>
      val r = rf.createReader(p)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (r.next()) out += r.get().getUTF8String(0).toString
      r.close(); out
    }.toSet
    assert(got == Set("urn:graft:doc:2", "urn:graft:doc:6"))
    // end-to-end: joining the archive against a tiny id frame is exact
    // whether or not the runtime filter fires
    import spark.implicits._
    val wanted = Seq("urn:graft:doc:2", "urn:graft:doc:6").toDF("record_id")
    val joined = spark.read.format("warc").load(dir).join(wanted, "record_id")
      .select("record_id", "text").collect()
    assert(joined.length == 2)
    val want = docs.filter(col("doc_id").isin(2L, 6L))
      .collect().map(r => s"urn:graft:doc:${r.getLong(0)}" -> r.getString(1)).toMap
    assert(joined.map(r => r.getString(0) -> r.getString(1)).toMap == want)
  }

  test("q_warc_fetch_rf: the join spelling hosts a runtime-filter subquery and matches the literal spelling") {
    // the headline bulk-fetch path (r13): request ids stay a DataFrame;
    // the optimizer must inject a DPP-style subquery on the warc scan
    // (record_id IN dynamicpruning#N) — that is the hook through which
    // SupportsRuntimeFiltering re-plans the scan into _cdx seeks at
    // runtime (seek planning itself is unit-pinned above)
    val rf = SparkEntry.queries("q_warc_fetch_rf")(spark, sfDir)
    val planStr = rf.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"no runtime-filter subquery on the warc scan:\n${planStr.take(3000)}")
    val lit = SparkEntry.queries("q_warc_fetch")(spark, sfDir)
    assert(rf.collect().toSeq == lit.collect().toSeq)
  }

  test("COUNT(*) pushdown: sidecar footers answer it; filters/appends decline it") {
    val dir = Files.createTempDirectory("graft_dsv2_cnt").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    ArchiveOps.writeCorpusWithIndex(docs, dir, shards = 4)
    val n = docs.count() + 4 // + per-shard warcinfo
    // complete pushdown: the plan carries WarcCountScan, value exact
    val cnt = spark.read.format("warc").load(dir).agg(count(lit(1)))
    assert(cnt.queryExecution.executedPlan.toString.contains("WarcCountScan"),
      cnt.queryExecution.executedPlan.toString.take(1500))
    assert(cnt.collect().head.getLong(0) == n)
    // a filter declines pushdown (our count is whole-corpus only) and
    // the ordinary scan still counts correctly
    val filtered = spark.read.format("warc").load(dir)
      .filter(col("warc_type") === "resource").agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("WarcCountScan"))
    assert(filtered.collect().head.getLong(0) == docs.count())
    // an appended shard deletes the sidecar (r12 hardening), so the
    // count falls back to a real scan and stays EXACT — a stale-footer
    // answer would under-count
    docs.limit(3).write.format("warc").mode("append").save(dir)
    val after = spark.read.format("warc").load(dir).agg(count(lit(1)))
    assert(!after.queryExecution.executedPlan.toString.contains("WarcCountScan"))
    // + 3 docs + the appended shard's own warcinfo record
    assert(after.collect().head.getLong(0) == n + 4)
  }

  test("response body decode is lazy: status/mime are prelude-only, error surfaces on demand") {
    // one response record whose BODY is undecodable (corrupt gzip
    // content-encoding on a text entity). A status/mime projection must
    // parse the prelude alone and report the TRUE status — identical to
    // what a full projection reports (column values can never depend on
    // pruning); the body failure surfaces exactly when text/error is
    // consumed.
    val dir = Files.createTempDirectory("graft_dsv2_lazy").toFile
    val w = graft.sources.Warc.shardWriter(new java.io.File(dir, "part-00000.warc"), gzip = false)
    w.write(graft.sources.Warc.WarcRecord("response", "urn:graft:doc:77",
      Some("https://graft.invalid/x/77"),
      Map("Content-Type" -> "application/http;msgtype=response"),
      ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n\r\nNOT-GZIP").getBytes("ISO-8859-1")))
    w.close()
    val d = dir.getAbsolutePath
    val slim = spark.read.format("warc").load(d)
      .select("record_id", "http_status", "content_type")
      .filter(col("record_id") === "urn:graft:doc:77").collect()
    assert(slim.length == 1)
    assert(slim.head.getInt(1) == 200 && slim.head.getString(2) == "text/html")
    val full = spark.read.format("warc").load(d)
      .filter(col("record_id") === "urn:graft:doc:77")
      .select("http_status", "content_type", "text", "error").collect()
    assert(full.length == 1)
    assert(full.head.getInt(0) == 200 && full.head.getString(1) == "text/html",
      "status/mime must be identical under the full projection")
    assert(full.head.isNullAt(2) && full.head.getString(3).contains("decode failed"),
      full.head.toString)
  }

  test("q_warc_http matches the direct computation (charset/chunked/gzip variants)") {
    val df = SparkEntry.queries("q_warc_http")(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)), sum(length(col("text")).cast("long")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("q_warc_http_meta plans a prelude-only scan (no text/error in ReadSchema)") {
    val df = SparkEntry.queries("q_warc_http_meta")(spark, sfDir)
    val scan = scanOf(df)
    val fields = scan.readSchema().fieldNames.toSet
    assert(!fields.contains("text") && !fields.contains("error"), scan.description())
    val rows = df.collect()
    assert(rows.map(_.getLong(2)).sum ==
      Tables.documents(spark, sfDir).count() + 24) // 3 gate-out records x 8 shards
    assert(rows.length == 3) // (200,text/html), (200,image/gif), (404,text/html)
  }

  test("q_warc_pushdown matches the direct computation") {
    val df = SparkEntry.queries("q_warc_pushdown")(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Tables.documents(spark, sfDir).filter(col("source") === "src7")
      .groupBy("lang").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("revisit policy: prelude-only view, text null, refers_to resolves; trio parses error-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trio_spec_").toString
    graft.ops.ArchiveOps.writeCrawlTrioCorpus(
      Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
        .filter(col("doc_id") < 40),
      dir, shards = 2)
    val all = spark.read.format("warc").load(dir)
    // record mix: 40 of each trio member, revisits for doc_id%7==3, 2 warcinfo
    val byType = all.groupBy("warc_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val nRev = (0 until 40).count(_ % 7 == 3)
    assert(byType == Map("request" -> 40L, "response" -> 40L,
      "metadata" -> 40L, "revisit" -> nRev.toLong, "warcinfo" -> 2L), byType.toString)
    assert(all.filter(col("error").isNotNull).count() == 0)
    // revisit view: status/mime from the STORED prelude, text NULL
    // always, refers_to = the referenced response id
    val revs = all.filter(col("warc_type") === "revisit")
      .select("record_id", "http_status", "content_type", "text", "refers_to")
      .collect()
    assert(revs.nonEmpty)
    revs.foreach { r =>
      assert(r.getInt(1) == 200 && r.getString(2) == "text/plain")
      assert(r.isNullAt(3), s"revisit text must be null: $r")
      assert(r.getString(4).startsWith("urn:graft:doc:"), r.toString)
    }
    // resolution is a JOIN against the referenced response — recovered
    // text equals the stored document text
    val resolved = all.filter(col("warc_type") === "revisit")
      .select(col("refers_to"))
      .join(all.filter(col("warc_type") === "response")
        .select(col("record_id"), col("text")),
        col("refers_to") === col("record_id"))
      .select(expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
        col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val want = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 40 && col("doc_id") % 7 === 3)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(resolved == want && resolved.nonEmpty)
    // request/metadata fall back generically: their payloads ARE text
    val req = all.filter(col("warc_type") === "request").select("text", "http_status")
      .collect()
    assert(req.forall(r => r.getString(0).startsWith("GET /") && r.isNullAt(1)))
    val meta = all.filter(col("warc_type") === "metadata")
      .select("text", "content_type").collect()
    assert(meta.forall(r => r.getString(0).contains("fetchTimeMs:") &&
      r.getString(1) == "application/warc-fields"))
    // a warc_type predicate on refers_to-bearing scans still prunes at
    // the header layer (refers_to is a header column)
    val pruned = all.filter(col("refers_to").isNotNull && col("warc_type") === "revisit")
    assert(pruned.count() == nRev.toLong)
  }
}

/** A RawLocalFileSystem under a scheme that exists ONLY in the session's
  * runtime Hadoop conf — resolvable exactly when the code under test
  * ships the driver's configuration to its open() call sites (the
  * object-store-credentials propagation contract, tested without an
  * object store). Must be top-level: Hadoop instantiates it reflectively.
  */
class MarkerFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftmarker"
  override def getUri: java.net.URI = java.net.URI.create("graftmarker:///")
}
