package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}
import graft.sources.Warc

/** Row produced by the WARC corpus reader: one per parsed record, plus
  * row-level `error` entries for malformed framing (the reference's
  * error-column discipline, `/root/reference/main.go:73-80`). Non-`text/`
  * payloads would surface through `headers`' Content-Type; the corpus
  * writer only emits UTF-8 text resources.
  */
final case class WarcDocRow(
    path: String,
    warc_type: String,
    record_id: String,
    target_uri: String,
    lang: String,
    source: String,
    text: String,
    error: String)

/** One CDX-style index entry: where record `record_id` lives — the
  * `(offset, length)` byte span of its gzip member (or plain-WARC
  * span) inside shard file `path`. The span inflates/parses standalone,
  * so a reader can serve ONE record without touching the rest of the
  * shard.
  */
final case class WarcIndexRow(record_id: String, path: String, offset: Long, length: Long)

/** Archive-format ingest: WARC (ISO 28500), the format 100 TB-scale web
  * crawls actually ship (see `graft.sources.Warc` for the framing and
  * the scale posture). The engine both WRITES a corpus as sharded
  * WARC/WARC-gz and READS it back through a streaming per-file parser,
  * and the registered query proves the full roundtrip against the
  * original parquet table.
  */
object ArchiveOps extends QueryModule {

  /** Write `docs` (doc_id, text, lang, source) as `shards` WARC files
    * under `dir`. Sharding is `doc_id % shards` — deterministic file
    * contents (records ascend by doc_id within a shard) so fixtures and
    * re-runs are byte-stable. The default layout cycles the codecs by
    * shard (`shard % 3`: gzip member-per-record — the Common Crawl
    * layout — then plain, then zstd frame-per-record — the `.warc.zst`
    * layout), so one corpus exercises every decode path; pass `codec =
    * Some(c)` (none/gzip/zstd) to force a uniform layout.
    *
    * Scale: one task per shard (`repartition(shards, shard)` keys every
    * record of a shard to one partition); each task streams its records
    * through one buffered writer — O(record) memory, no collect. A
    * cluster deployment points `dir` at shared storage exactly like any
    * file sink.
    */
  def writeCorpus(
      docs: DataFrame,
      dir: String,
      shards: Int,
      codec: Option[String] = None): Unit =
    // one implementation: the indexed writer IS the writer (the index
    // rows are a few tens of bytes per record; discarding them costs
    // nothing and keeps the two paths incapable of drifting apart)
    writeIndexedCorpus(docs, dir, shards, codec).foreach((_: WarcIndexRow) => ())

  /** Shared sharding prologue: `doc_id % shards`, one partition per
    * shard, records ascending by doc_id within a shard — deterministic
    * file contents for fixtures and re-runs. Row layout:
    * (doc_id, text, lang, source, shard).
    */
  private def shardedByDoc(docs: DataFrame, shards: Int): DataFrame =
    docs
      .select(col("doc_id").cast("long"), col("text"), col("lang"), col("source"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")

  private def toRow(path: String)(e: Either[String, Warc.WarcRecord]): WarcDocRow =
    e match {
      case Right(rec) =>
        WarcDocRow(
          path = path,
          warc_type = rec.warcType,
          record_id = rec.recordId,
          target_uri = rec.targetUri.orNull,
          lang = rec.headers.getOrElse("X-Graft-Lang", null),
          source = rec.headers.getOrElse("X-Graft-Source", null),
          text = new String(rec.payload, java.nio.charset.StandardCharsets.UTF_8),
          error = null)
      case Left(err) =>
        WarcDocRow(path, null, null, null, null, null, null, err)
    }

  /** Read every `.warc` / `.warc.gz` under `dir` into a DataFrame of
    * [[WarcDocRow]]. Parallelism unit = file (the format's standard;
    * see `Warc`'s scale notes); each task parses its file as a STREAM
    * via PortableDataStream — the file is never materialized whole.
    */
  def readCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.sparkContext.binaryFiles(dir + "/part-*.warc*")
    files.flatMap { case (path, pds) =>
      val in = pds.open()
      // close with the TASK, not iterator exhaustion — a limit/error
      // downstream must not leak the file handle
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
      Warc.parseStream(in, Warc.codecOf(path)).map(toRow(path))
    }.toDF()
  }

  /** [[writeCorpus]] that also emits the CDX-style record index — one
    * [[WarcIndexRow]] per resource record. Returns the index as a
    * LAZY Dataset whose evaluation performs the write (one job);
    * callers materialize it exactly once (the registered query writes
    * it to parquet — the production flow, where the index IS a table
    * next to the archive). Same sharding/layout rules as
    * [[writeCorpus]].
    */
  def writeIndexedCorpus(
      docs: DataFrame,
      dir: String,
      shards: Int,
      codec: Option[String] = None): org.apache.spark.sql.Dataset[WarcIndexRow] = {
    import docs.sparkSession.implicits._
    shardedByDoc(docs, shards).mapPartitions { rows =>
      // eager per-partition write (files complete and writers closed
      // before any index row is consumed); the index entries are tiny
      // (4 fields) so buffering a partition's worth is bounded
      val out = scala.collection.mutable.ArrayBuffer[WarcIndexRow]()
      var cur: Warc.WarcShardWriter = null
      var curShard = -1L
      var curPath: String = null
      try {
        rows.foreach { r =>
          val shard = r.getLong(4)
          if (shard != curShard) {
            if (cur != null) cur.close()
            val c = codec.getOrElse(shard % 3 match {
              case 0 => Warc.CodecGzip
              case 1 => Warc.CodecNone
              case _ => Warc.CodecZstd
            })
            val f = new java.io.File(dir, f"part-$shard%05d." + Warc.extOf(c))
            cur = Warc.shardWriter(f, c)
            curShard = shard
            curPath = f.getAbsolutePath
          }
          val docId = r.getLong(0)
          val text = r.getString(1)
          require(text != null && r.getString(2) != null && r.getString(3) != null,
            s"writeIndexedCorpus: null text/lang/source for doc_id=$docId")
          val recId = s"urn:graft:doc:$docId"
          val (off, len) = cur.write(Warc.WarcRecord(
            warcType = "resource",
            recordId = recId,
            targetUri = Some(s"https://graft.invalid/${r.getString(3)}/$docId"),
            headers = Map(
              "Content-Type" -> "text/plain; charset=utf-8",
              "X-Graft-Lang" -> r.getString(2),
              "X-Graft-Source" -> r.getString(3)),
            payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          out += WarcIndexRow(recId, curPath, off, len)
        }
      } finally if (cur != null) cur.close()
      out.iterator
    }
  }

  /** Random access into an indexed WARC corpus: for each index row,
    * seek to the member's byte span and parse THAT record alone — the
    * serve-one-document pattern an archived crawl supports only through
    * its index (Common Crawl's CDX service is exactly this). One tiny
    * index exchange (grouping requests by shard file), then each task
    * reads its files with ascending-offset seeks; bytes read ==
    * Σ requested member lengths, independent of shard or corpus size.
    */
  def fetchRecords(index: DataFrame): DataFrame = {
    import index.sparkSession.implicits._
    index.select("record_id", "path", "offset", "length")
      .repartition(col("path"))
      .sortWithinPartitions("path", "offset")
      .mapPartitions { rows =>
        // Hadoop FileSystem, not java.io: the index may point at any
        // storage the writer's dir lived on (file:/, hdfs:/, s3a:/ —
        // the Configuration picks up the cluster's site files from the
        // executor classpath exactly like every other scan)
        val conf = new org.apache.hadoop.conf.Configuration()
        var curPath: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def close(): Unit = if (in != null) { in.close(); in = null }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => close()))
        rows.map { r =>
          val (recId, p, off, len) =
            (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
          if (len > Int.MaxValue - 8L)
            WarcDocRow(p, null, recId, null, null, null, null,
              s"member too large to buffer ($len bytes)")
          else {
            if (p != curPath) {
              close()
              val hp = new org.apache.hadoop.fs.Path(p)
              in = hp.getFileSystem(conf).open(hp)
              curPath = p
            }
            val buf = new Array[Byte](len.toInt)
            in.readFully(off, buf) // positioned read: ascending seeks per file
            val row = Warc.parseStream(new java.io.ByteArrayInputStream(buf), Warc.codecOf(p))
              .map(toRow(p)).toSeq.headOption
              .getOrElse(WarcDocRow(p, null, recId, null, null, null, null,
                s"empty member span at $off+$len"))
            // a stale index (corpus rewritten underneath it) can hand
            // back a DIFFERENT parseable record — that must be an error
            // row, never silently mis-attributed text
            if (row.error == null && row.record_id != recId)
              WarcDocRow(p, null, recId, null, null, null, null,
                s"index mismatch: span at $off holds '${row.record_id}'")
            else row
          }
        }
      }.toDF()
  }

  /** Streaming WARC ingest: parse crawl shards AS THEY LAND in `dir` —
    * the continuous-crawl admission pattern (a fetcher drops finished
    * `.warc.gz` shards into the landing prefix; the engine tails the
    * directory). Built on the `binaryFile` file-stream source, so the
    * exactly-once file-tracking ledger (which files a batch has
    * consumed) is Spark's own checkpointed source log; downstream the
    * rows compose with the existing streaming gates (perplexity,
    * dedup admission) via foreachBatch. The file-stream source hands
    * whole-file `content` per row — shard size bounds batch memory
    * (crawls shard at ~1 GB precisely so per-file processing stays
    * bounded); the batch reader's PortableDataStream path remains the
    * lowest-memory bulk option.
    */
  def streamCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binaryFileSchema = new StructType()
      .add("path", StringType).add("modificationTime", TimestampType)
      .add("length", LongType).add("content", BinaryType)
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        Warc.parseStream(new java.io.ByteArrayInputStream(bytes),
          Warc.codecOf(path)).map(toRow(path))
      }
      .toDF()
  }

  /** Write `docs` as `shards` Avro object-container files (sharding and
    * determinism as in [[writeCorpus]]; one streaming writer per task).
    */
  def writeAvroCorpus(docs: DataFrame, dir: String, shards: Int): Unit = {
    shardedByDoc(docs, shards).foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      // rows arrive sorted by (shard, doc_id): stream each contiguous
      // shard group straight into its file writer, O(block) memory
      val grouped = new Iterator[Iterator[org.apache.spark.sql.Row]] {
        private val buf = rows.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): Iterator[org.apache.spark.sql.Row] = {
          val shard = buf.head.getLong(4)
          new Iterator[org.apache.spark.sql.Row] {
            def hasNext: Boolean = buf.hasNext && buf.head.getLong(4) == shard
            def next(): org.apache.spark.sql.Row = buf.next()
          }
        }
      }
      grouped.foreach { grp =>
        val first = grp.next()
        val shard = first.getLong(4)
        graft.sources.AvroIo.writeFile(
          new java.io.File(dir, f"part-$shard%05d.avro"),
          (Iterator(first) ++ grp).map { r =>
            require(r.getString(1) != null && r.getString(2) != null && r.getString(3) != null,
              s"writeAvroCorpus: null text/lang/source for doc_id=${r.getLong(0)}")
            graft.sources.AvroIo.Doc(r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
          })
      }
    }
  }

  /** Read every `.avro` container under `dir` (file = unit of
    * parallelism; stream decode via PortableDataStream, schema taken
    * from each file's own header).
    */
  def readAvroCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(dir + "/part-*.avro")
      .flatMap { case (_, pds) =>
        val in = pds.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        graft.sources.AvroIo.readStream(in).map(d =>
          (d.docId, d.text, d.lang, d.source))
      }
      .toDF("doc_id", "text", "lang", "source")
  }

  /** Streaming Avro ingest: the [[streamCorpus]] pattern for object
    * containers — tail a landing directory of `.avro` shards through
    * the binaryFile file-stream source (checkpointed source ledger =
    * exactly-once per shard), stream-decoding each container from its
    * own embedded schema.
    */
  def streamAvroCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binaryFileSchema = new StructType()
      .add("path", StringType).add("modificationTime", TimestampType)
      .add("length", LongType).add("content", BinaryType)
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.avro")
      .load(dir)
      .select("content")
      .as[Array[Byte]]
      .flatMap { bytes =>
        graft.sources.AvroIo.readStream(new java.io.ByteArrayInputStream(bytes))
          .map(d => (d.docId, d.text, d.lang, d.source))
      }
      .toDF("doc_id", "text", "lang", "source")
  }

  def queries: Seq[Q] = Seq(
    // Full WARC roundtrip: documents -> sharded .warc/.warc.gz ->
    // streaming parse -> per-source aggregate. The oracle aggregates the
    // ORIGINAL parquet table, so equality proves byte-exact framing
    // (Content-Length in bytes vs LENGTH in chars over multi-byte UTF-8),
    // id/header fidelity, and both compression layouts. The aggregation
    // computes lengths BEFORE its exchange — parsed text never shuffles
    // (PlanHygieneSpec's corpus-wide invariant).
    Q(
      "q_warc_roundtrip",
      """SELECT source,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
        |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        |       MIN(doc_id) AS min_id,
        |       MAX(doc_id) AS max_id
        |FROM documents GROUP BY source ORDER BY source"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_warc").toFile.getAbsolutePath
      writeCorpus(Tables.documents(s, d).select("doc_id", "text", "lang", "source"),
        dir, shards = 8)
      readCorpus(s, dir)
        .filter(col("warc_type") === "resource" && col("error").isNull)
        .select(
          col("source"),
          expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
          length(col("text")).cast("long").as("n_chars"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("source")
    },

    // DataSourceV2 scan with pruning + pushdown: the same corpus read
    // through `format("warc")`, projecting NO text column (every
    // payload skipped, never decoded) under a pushed source filter
    // (non-matching records cost a header parse + skip). The executed
    // plan's ReadSchema/PushedFilters are spec-pinned in WarcDsv2Spec;
    // the oracle pins the values.
    Q(
      "q_warc_pushdown",
      """SELECT lang,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents WHERE source = 'src7'
        |GROUP BY lang ORDER BY lang"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_warc_ds").toFile.getAbsolutePath
      writeCorpus(Tables.documents(s, d).select("doc_id", "text", "lang", "source"),
        dir, shards = 8)
      s.read.format("warc").load(dir)
        .filter(col("warc_type") === "resource" && col("source") === "src7")
        .select(col("lang"),
          expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy("lang")
    },

    // Indexed random access: write the corpus WITH its CDX-style record
    // index (persisted as a parquet table next to the archive — the
    // production layout), then serve a doc_id subset by SEEKING straight
    // to each record's member span. Bytes read scale with the request,
    // not the corpus. Oracle: the same subset from the original table.
    Q(
      "q_warc_fetch",
      """SELECT doc_id,
        |       CAST(LENGTH(text) AS INT) AS n_chars,
        |       lang, source
        |FROM documents WHERE doc_id % 37 = 0 ORDER BY doc_id"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_warcidx").toFile.getAbsolutePath
      val idxDir = Files.createTempDirectory("graft_warc_cdx").toFile.getAbsolutePath
      writeIndexedCorpus(Tables.documents(s, d).select("doc_id", "text", "lang", "source"),
        dir, shards = 8)
        .write.mode("overwrite").parquet(idxDir)
      val wanted = s.read.parquet(idxDir)
        .filter(expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)") % 37 === 0)
      fetchRecords(wanted)
        .select(
          expr("CAST(substring_index(record_id, ':', -1) AS BIGINT)").as("doc_id"),
          length(col("text")).as("n_chars"),
          col("lang"), col("source"))
        .orderBy("doc_id")
    },

    // DSv2 WRITE path: df.write.format("warc") (task-attempt temp files
    // + driver-side rename commit, zstd frames), read back through the
    // streaming parser, aggregate per (source, lang) vs the original
    // table. With q_warc_roundtrip/q_warc_pushdown this closes the
    // connector matrix: RDD read, DSv2 read, DSv2 write.
    Q(
      "q_warc_write",
      """SELECT source, lang, COUNT(*) AS n_docs
        |FROM documents GROUP BY source, lang ORDER BY source, lang"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_warc_w").toFile.getAbsolutePath
      Tables.documents(s, d).select("doc_id", "text", "lang", "source")
        .repartition(8)
        .write.format("warc").mode("append").option("codec", "zstd").save(dir)
      readCorpus(s, dir)
        .filter(col("warc_type") === "resource" && col("error").isNull)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "lang")
    },

    // Avro object-container roundtrip: documents -> sharded .avro
    // (deflate blocks, embedded writer schema) -> per-file stream
    // decode -> per-lang aggregate vs the original parquet. The reader
    // takes the schema from each FILE's header, so equality also proves
    // schema fidelity end-to-end.
    Q(
      "q_avro_roundtrip",
      """SELECT lang,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
        |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        |       MIN(doc_id) AS min_id,
        |       MAX(doc_id) AS max_id
        |FROM documents GROUP BY lang ORDER BY lang"""
    ) { (s, d) =>
      val dir = Files.createTempDirectory("graft_avro").toFile.getAbsolutePath
      writeAvroCorpus(Tables.documents(s, d).select("doc_id", "text", "lang", "source"),
        dir, shards = 8)
      readAvroCorpus(s, dir)
        .select(col("lang"), col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    }
  )
}
