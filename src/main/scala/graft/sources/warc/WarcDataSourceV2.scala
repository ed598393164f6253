package graft.sources.warc

import java.nio.charset.StandardCharsets.UTF_8
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{HttpWire, SerializableHadoopConf, Warc}

/** DataSourceV2 connector for WARC corpora: `spark.read.format("warc")
  * .load(dir)` (registered via DataSourceRegister). One InputPartition
  * per shard file — the format's unit of parallelism — with the Catalyst
  * integrations the RDD helper cannot express:
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): when the
  *    projection doesn't need `text` (or, for HTTP response records, any
  *    payload-derived column), the reader SKIPS every payload (no
  *    buffering, no gunzip-to-byte[], no decode) — a metadata-only scan
  *    over a crawl reads headers only.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): `EqualTo` / `In` /
  *    `IsNotNull` / `StringStartsWith` on the header-level columns
  *    (warc_type / record_id / target_uri / lang / source / path) are
  *    evaluated BEFORE the payload is touched; predicates on
  *    `http_status` / `content_type` are evaluated as soon as the HTTP
  *    prelude is parsed — filtered-out records never pay charset decode.
  *    `text`/`error` predicates need the parse result and stay with
  *    Spark.
  *  - **CDX-index-assisted scans**: when the corpus carries its record
  *    index (the `_cdx` parquet sidecar `ArchiveOps.writeCorpusWithIndex`
  *    maintains — one `(record_id, path, offset, length)` row per
  *    record) and the pushed filters pin `record_id` to literals
  *    (`EqualTo`/`In`), the scan plans SEEK partitions from the index
  *    instead of full-shard scans: one partition per touched file, each
  *    reading exactly the requested members' byte spans — bytes read
  *    scale with the request, not the corpus (Common Crawl's CDX service
  *    pattern, behind the connector). A stale index (span no longer
  *    holding the requested record) surfaces as an error ROW carrying
  *    the requested record_id, never silently mis-attributed text.
  *  - **Streaming** (`MicroBatchStream`): `spark.readStream
  *    .format("warc").load(landingDir)` tails the directory with
  *    landing-dir semantics — an offset is the set of shard files seen,
  *    each micro-batch reads exactly the newly-landed files, and the
  *    checkpointed offset log makes that exactly-once across restarts. A
  *    poisoned shard costs error rows (the row-level channel), never a
  *    wedged retry loop.
  *
  * **HTTP response records** (ISO 28500 §6.3 — what real crawls ship):
  * `response` records with Content-Type `application/http` are parsed as
  * captured HTTP messages; the schema exposes `http_status` (INT) and
  * `content_type` (the entity's media type), and `text` is the entity
  * body decoded under the message's own charset — see
  * `Warc.payloadView`. Error rows from malformed records carry
  * `path`+`error`; pushed predicates are evaluated against the error
  * row's ACTUAL values (path non-null, other columns null), so
  * `filter(col("path") === f)` returns a file's error rows with or
  * without pushdown.
  *
  * All readers and writers use the DRIVER's Hadoop configuration
  * (`sessionState.newHadoopConf()`, broadcast once per scan/write as a
  * [[SerializableHadoopConf]]) — runtime `spark.hadoop.*` settings such
  * as object-store credentials reach executor-side opens exactly like
  * the built-in file sources.
  */
class WarcDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSourceV2.Schema
  // writes hand the incoming frame's schema to getTable (reads still
  // come through inferSchema's fixed record schema) — the write frame
  // is the 4-column corpus shape, not the 10-column record shape
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "warc source requires a path: spark.read.format(\"warc\").load(dir)")
    new WarcTable(path, schema)
  }
}

object WarcDataSourceV2 {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("http_status", IntegerType),
    StructField("content_type", StringType),
    StructField("text", StringType),
    StructField("error", StringType),
    // WARC-Refers-To: the referenced record's id on revisit (and WET
    // conversion) records — the join key that resolves a deduplicated
    // revisit to its stored payload. Null when the header is absent.
    StructField("refers_to", StringType)))

  /** Columns whose predicates can be answered from the WARC header block
    * alone, before any payload byte is read.
    */
  private[warc] val HeaderCols =
    Set("path", "warc_type", "record_id", "target_uri", "lang", "source",
      "refers_to")

  /** Payload-prelude columns: for HTTP response records they need the
    * HTTP message prelude (not the decoded body); for other records they
    * are header-derived (`content_type`) or constant-null
    * (`http_status`).
    */
  private[warc] val HttpCols = Set("http_status", "content_type")

  private[warc] val PushableCols = HeaderCols ++ HttpCols

  /** Name of the CDX-style index sidecar inside a corpus directory (the
    * leading underscore keeps it outside every `*.warc*` scan glob).
    */
  val IndexSidecar = "_cdx"

  /** The sidecar's schema is part of its contract (ArchiveOps.WarcIndexRow
    * writes it) — reading it with the stored schema skips the
    * footer-inference Spark job a bare `read.parquet` pays per scan.
    */
  val IndexSchema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("path", StringType),
    StructField("offset", LongType),
    StructField("length", LongType)))

  private[warc] def headerField(
      name: String, path: String, warcType: String,
      recordId: String, targetUri: String,
      headers: Map[String, String]): String = name match {
    case "path"       => path
    case "warc_type"  => warcType
    case "record_id"  => recordId
    case "target_uri" => targetUri
    case "lang"       => Warc.headerOf(headers, "X-Graft-Lang")
    case "source"     => Warc.headerOf(headers, "X-Graft-Source")
    case "refers_to"  => Warc.headerOf(headers, "WARC-Refers-To")
    case _            => null
  }

  /** Shard files of a corpus directory: every `*.warc*` that is not a
    * hidden file (leading `.`/`_` — uncommitted temps, the `_cdx`
    * sidecar) and not a Hadoop checksum sidecar (`.crc` — the local
    * ChecksumFileSystem emits them next to every written file, the same
    * artifact the built-in sinks leave).
    */
  private[warc] def listShards(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[String] =
    fs.globStatus(new Path(dir, "*.warc*")).toSeq.map(_.getPath)
      .filterNot { q =>
        val n = q.getName
        n.startsWith(".") || n.startsWith("_") || n.endsWith(".crc")
      }
      .map(_.toString)

  /** Exact record count of a corpus from its `_cdx` sidecar's parquet
    * footers (one row per record by the sidecar contract) — no Spark
    * job, cached per directory for the session lifetime (archive shards
    * are immutable once visible; a rewritten corpus gets a new dir,
    * the same immutability contract the landing-dir stream relies on).
    */
  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.OptionalLong]()

  /** Drop a directory's cached exact row count — the DSv2 write path
    * calls this on commit because an append breaks the
    * "immutable once visible" premise the cache rests on.
    */
  private[warc] def invalidateRowCount(dir: String): Unit = {
    rowCountCache.remove(dir); ()
  }

  private[warc] def sidecarRowCount(
      fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      conf: org.apache.hadoop.conf.Configuration): java.util.OptionalLong =
    rowCountCache.computeIfAbsent(dir.toString, _ => {
      val idx = new Path(dir, IndexSidecar)
      try {
        if (!fs.exists(idx)) java.util.OptionalLong.empty()
        else {
          val n = fs.listStatus(idx).iterator
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map { s =>
              val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(s.getPath, conf)
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
              try r.getFooter.getBlocks.asInstanceOf[java.util.List[
                org.apache.parquet.hadoop.metadata.BlockMetaData]]
                .stream().mapToLong(_.getRowCount).sum()
              finally r.close()
            }.sum
          java.util.OptionalLong.of(n)
        }
      } catch { case _: java.io.IOException => java.util.OptionalLong.empty() }
    })

  private[warc] def broadcastConf(): Broadcast[SerializableHadoopConf] = {
    val spark = SparkSession.active
    spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
  }
}

final class WarcTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"warc($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(dir)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WarcWriteBuilder(dir, info)
}

// ---------------------------------------------------------------------------
// WRITE path
// ---------------------------------------------------------------------------

/** Batch write: `df.write.format("warc").mode("append").save(dir)`.
  * Input schema must carry (doc_id LONG, text, lang, source) — the corpus
  * row shape. Each task writes ONE shard, to a hidden temp file; the
  * driver-side commit renames every temp into place and abort deletes
  * them, so a failed/speculative task attempt never leaves a partial
  * shard visible — the connector's own commit protocol, same contract
  * as the built-in file sinks. Shard names embed the queryId
  * (`part-NNNNN-<queryId>.<ext>`), so a second append job to the same
  * directory can never rename onto an existing shard. Codec via
  * `.option("codec", none|gzip|zstd)`, default gzip (the crawl layout).
  */
final class WarcWriteBuilder(dir: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val schema = info.schema()
      val need = Seq("doc_id", "text", "lang", "source")
      val missing = need.filterNot(schema.fieldNames.contains)
      require(missing.isEmpty,
        s"warc write needs columns ${need.mkString(", ")}; missing: ${missing.mkString(", ")}")
      require(schema(schema.fieldIndex("doc_id")).dataType == LongType,
        s"warc write: doc_id must be LONG, got ${schema(schema.fieldIndex("doc_id")).dataType.simpleString}")
      val codec = Option(info.options.get("codec")).getOrElse(Warc.CodecGzip)
      Warc.extOf(codec) // fail at planning on an unknown codec
      new WarcBatchWrite(dir, schema, codec, info.queryId, WarcDataSourceV2.broadcastConf())
    }
  }
}

final class WarcBatchWrite(
    dir: String, schema: StructType, codec: String, queryId: String,
    bconf: Broadcast[SerializableHadoopConf])
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    WarcWriterFactory(dir, schema, codec, queryId, bconf)

  private def fs = new Path(dir).getFileSystem(bconf.value.value)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    f.mkdirs(new Path(dir))
    messages.foreach {
      case WarcCommit(temp, finalName) if temp.nonEmpty =>
        val ok = f.rename(new Path(temp), new Path(new Path(dir), finalName))
        require(ok, s"warc commit: rename $temp -> $finalName failed")
      case _ => () // empty partition: nothing to publish
    }
    // Appending to an indexed corpus would leave a STALE `_cdx` sidecar:
    // the seek planner treats "absent from the index" as "absent from
    // the corpus", so record_id-pinned scans would silently miss every
    // appended record, and the cached exact row count would keep
    // serving the pre-append figure. Deleting the sidecar degrades those
    // scans to full-shard reads — slower, never wrong; re-index with
    // ArchiveOps.writeCorpusWithIndex to get seeks back.
    val sidecar = new Path(new Path(dir), WarcDataSourceV2.IndexSidecar)
    if (f.exists(sidecar)) { f.delete(sidecar, true); () }
    // the cache keys on Path.toString (normalized), not the raw option
    WarcDataSourceV2.invalidateRowCount(new Path(dir).toString)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    messages.foreach {
      case WarcCommit(temp, _) if temp.nonEmpty => f.delete(new Path(temp), false); ()
      case _ => ()
    }
  }
}

final case class WarcCommit(tempPath: String, finalName: String) extends WriterCommitMessage

final case class WarcWriterFactory(
    dir: String, schema: StructType, codec: String, queryId: String,
    bconf: Broadcast[SerializableHadoopConf])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, schema, codec, queryId, partitionId, taskId, bconf)
}

final class WarcDataWriter(
    dir: String, schema: StructType, codec: String,
    queryId: String, partitionId: Int, taskId: Long,
    bconf: Broadcast[SerializableHadoopConf])
    extends DataWriter[InternalRow] {
  private val iDoc = schema.fieldIndex("doc_id")
  private val iText = schema.fieldIndex("text")
  private val iLang = schema.fieldIndex("lang")
  private val iSource = schema.fieldIndex("source")
  // job-unique shard name: a second append job renames NEW files in,
  // never onto an existing shard (the built-in file sinks' unique part
  // naming); the temp name contains NO ".warc" substring (a crashed
  // attempt must never match a scan glob) and is unique per task
  // ATTEMPT, so a speculative duplicate can never clobber
  private val finalName = f"part-$partitionId%05d-$queryId.${Warc.extOf(codec)}"
  private val temp = new Path(dir, s".tmp-$queryId-$taskId-$partitionId")
  private lazy val fs = temp.getFileSystem(bconf.value.value)
  private var writer: Warc.WarcShardWriter = _
  private var open = false

  override def write(row: InternalRow): Unit = {
    if (!open) {
      fs.mkdirs(new Path(dir))
      writer = Warc.shardWriter(fs.create(temp, true), codec, finalName)
      open = true
    }
    require(!row.isNullAt(iDoc),
      "warc write: null doc_id (would forge a duplicate record id)")
    val docId = row.getLong(iDoc)
    require(!row.isNullAt(iText) && !row.isNullAt(iLang) && !row.isNullAt(iSource),
      s"warc write: null text/lang/source for doc_id=$docId")
    val source = row.getUTF8String(iSource).toString
    writer.write(Warc.WarcRecord(
      warcType = "resource",
      recordId = s"urn:graft:doc:$docId",
      targetUri = Some(s"https://graft.invalid/$source/$docId"),
      headers = Map(
        "Content-Type" -> "text/plain; charset=utf-8",
        "X-Graft-Lang" -> row.getUTF8String(iLang).toString,
        "X-Graft-Source" -> source),
      payload = row.getUTF8String(iText).getBytes))
  }

  override def commit(): WriterCommitMessage =
    if (open) { writer.close(); WarcCommit(temp.toString, finalName) }
    // empty partition: publish nothing (the driver skips empty commits)
    else WarcCommit("", "")
  override def abort(): Unit = {
    if (open) writer.close()
    fs.delete(temp, false); ()
  }
  override def close(): Unit = ()
}

// ---------------------------------------------------------------------------
// READ path
// ---------------------------------------------------------------------------

final class WarcScanBuilder(dir: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import WarcDataSourceV2.PushableCols
  private var required: StructType = WarcDataSourceV2.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var countStarCols: Int = 0
  private var countStarValue: Long = -1L

  /** COUNT(*) pushdown (COMPLETE): an unfiltered, un-limited,
    * ungrouped count over an indexed corpus is answered from the
    * `_cdx` sidecar's parquet FOOTERS — zero record parses, zero
    * shard bytes read (the index covers every record including
    * warcinfo: "absent from the index == absent from the corpus", and
    * the DSv2 writer deletes a sidecar it cannot keep exact on
    * append). Anything else — residual or pushed filters, limits,
    * group-bys, non-CountStar aggregates, no sidecar — declines, and
    * Spark runs the ordinary scan + aggregate.
    */
  private def completeCount(aggregation:
      org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : java.util.OptionalLong = {
    val shapeOk = pushed.isEmpty && limit < 0 &&
      aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().nonEmpty &&
      aggregation.aggregateExpressions().forall(
        _.isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar])
    if (!shapeOk) return java.util.OptionalLong.empty()
    val p = new Path(dir)
    val conf = WarcDataSourceV2.broadcastConf().value.value
    val fs = p.getFileSystem(conf)
    if (!fs.getFileStatus(p).isDirectory) java.util.OptionalLong.empty()
    else WarcDataSourceV2.sidecarRowCount(fs, p, conf)
  }

  override def supportCompletePushDown(aggregation:
      org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    completeCount(aggregation).isPresent

  override def pushAggregation(aggregation:
      org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val n = completeCount(aggregation)
    if (!n.isPresent) return false
    countStarValue = n.getAsLong
    countStarCols = aggregation.aggregateExpressions().length
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** PARTIAL limit pushdown: each partition reader stops parsing its
    * shard after emitting `limit` rows (an exploratory `.limit(5)` on a
    * 1 GB crawl shard costs 5 record parses, not a file scan); Spark
    * still applies the global limit across partitions
    * (`isPartiallyPushed` stays true).
    */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  private def literalOk(col: String, v: Any): Boolean =
    if (col == "http_status") v.isInstanceOf[Integer] else v.isInstanceOf[String]

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo(a, v) => PushableCols(a) && literalOk(a, v)
      // In with non-null values: a null column never matches, which is
      // exactly SQL's `x IN (...)` null semantics
      case In(a, vs) =>
        PushableCols(a) && vs.nonEmpty && vs.forall(v => v != null && literalOk(a, v))
      case IsNotNull(a) => PushableCols(a)
      case StringStartsWith(a, _) => PushableCols(a) && a != "http_status"
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (countStarCols > 0) WarcCountScan(dir, countStarValue, countStarCols)
    else WarcScan(dir, required, pushed, limit, WarcDataSourceV2.broadcastConf())
}

/** The completely-pushed COUNT(*) scan: one partition, one row, the
  * sidecar-footer count — no shard byte is ever opened.
  */
final case class WarcCountScan(dir: String, count: Long, nCols: Int)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType((0 until nCols).map(i =>
      StructField(s"count_star_$i", org.apache.spark.sql.types.LongType,
        nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcCountScan($dir) PushedAggregation: [COUNT(*)] = $count"
  override def planInputPartitions(): Array[InputPartition] =
    Array(WarcCountPartition(count, nCols))
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcCountReaderFactory
}

final case class WarcCountPartition(count: Long, nCols: Int) extends InputPartition

private[warc] final class WarcCountReaderFactory
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[WarcCountPartition]
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array.fill[Any](part.nCols)(part.count))
      override def close(): Unit = ()
    }
}

/** Compiled view of a scan's projection + pushed predicates, shared by
  * the full-scan, seek, and streaming readers. Serializable — compiled
  * once and shipped inside the reader factory.
  */
private[warc] final class RowShaper(required: StructType, pushed: Array[Filter])
    extends Serializable {
  import WarcDataSourceV2.{headerField, HeaderCols}

  val needText: Boolean = required.fieldNames.contains("text")
  val needError: Boolean = required.fieldNames.contains("error")
  val needHttp: Boolean =
    required.fieldNames.contains("http_status") || required.fieldNames.contains("content_type")

  private def compile(f: Filter): (String, Any => Boolean) = f match {
    case EqualTo(a, v)          => (a, x => x != null && x == v)
    case In(a, vs)              => val set = vs.toSet; (a, x => x != null && set.contains(x))
    case IsNotNull(a)           => (a, x => x != null)
    case StringStartsWith(a, p) => (a, x => x != null && x.asInstanceOf[String].startsWith(p))
    case other => throw new IllegalStateException(s"warc: unpushable filter leaked: $other")
  }

  private val headerPreds: Array[(String, Any => Boolean)] =
    pushed.filter(f => HeaderCols(f.references.head)).map(compile)
  private val httpPreds: Array[(String, Any => Boolean)] =
    pushed.filterNot(f => HeaderCols(f.references.head)).map(compile)

  val hasHttpPreds: Boolean = httpPreds.nonEmpty

  /** Do this record's payload bytes need buffering at all? Called on the
    * raw header block, BEFORE the payload is read (the streaming
    * parser's `keepPayload` hook).
    */
  def needsPayload(file: String, headers: Map[String, String]): Boolean = {
    if (!headerPass(file, headers)) return false
    val warcType = Warc.headerOf(headers, "WARC-Type")
    val recCt = Warc.headerOf(headers, "Content-Type")
    if (Warc.isHttpResponse(warcType, recCt))
      needText || needError || needHttp || hasHttpPreds
    else if (Warc.isHttpRevisit(warcType, recCt))
      // revisit: status/mime come from the stored prelude; text is
      // null by policy, so the payload matters only to http columns
      needError || needHttp || hasHttpPreds
    else {
      // non-response: content_type is header-derived — evaluate http
      // predicates NOW so a filtered-out record costs a skip, not a
      // UTF-8 decode of the payload
      if (!httpPass(null, HttpWire.mimeOf(recCt))) false
      else needText
    }
  }

  def headerPass(file: String, headers: Map[String, String]): Boolean = {
    def get(k: String): String = Warc.headerOf(headers, k)
    headerPreds.forall { case (name, p) =>
      p(headerField(name, file, get("WARC-Type"), get("WARC-Record-ID"),
        get("WARC-Target-URI"), headers))
    }
  }

  def httpPass(status: Integer, contentType: String): Boolean =
    httpPreds.forall { case (name, p) =>
      p(if (name == "http_status") status else contentType)
    }

  /** Shape one parsed record into an output row, or null when a pushed
    * predicate excludes it.
    */
  def recordRow(file: String, rec: Warc.WarcRecord): InternalRow = {
    if (!headerPass(file, rec.headers)) return null
    val recCt = Warc.headerOf(rec.headers, "Content-Type")
    val view: Warc.PayloadView =
      if (Warc.isHttpResponse(rec.warcType, recCt)) {
        if (needText || needError || needHttp || hasHttpPreds)
          // body work (de-chunk, gunzip, charset) only when text/error is
          // actually consumed — a status/mime histogram over a crawl
          // parses preludes only
          Warc.payloadView(rec, needBody = needText || needError)
        // nothing payload-derived is projected or filtered: the payload
        // was never buffered (needsPayload said skip) — all nulls is the
        // correct view of the pruned columns
        else Warc.PayloadView(None, null, null, null)
      } else if (Warc.isHttpRevisit(rec.warcType, recCt)) {
        if (needError || needHttp || hasHttpPreds) Warc.payloadView(rec)
        else Warc.PayloadView(None, null, null, null)
      } else {
        Warc.PayloadView(None, HttpWire.mimeOf(recCt),
          if (needText) new String(rec.payload, UTF_8) else null, null)
      }
    val status: Integer = view.httpStatus.map(Integer.valueOf).orNull
    if (!httpPass(status, view.contentType)) return null
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      required.fields(i).name match {
        case "http_status" => row.update(i, status)
        case "content_type" => row.update(i, utf8OrNull(view.contentType))
        case "text" => row.update(i, utf8OrNull(view.text))
        case "error" => row.update(i, utf8OrNull(view.error))
        case n => row.update(i, utf8OrNull(headerField(n, file, rec.warcType,
          rec.recordId, rec.targetUri.orNull, rec.headers)))
      }
      i += 1
    }
    row
  }

  /** Shape a row-level ERROR into an output row (or null when pushed
    * predicates exclude it). Predicates are evaluated against the error
    * row's ACTUAL values — path is the file, record_id is the requested
    * id on an index-seek miss (so the requester SEES the failure), every
    * other column null — never against a blanket "preds exclude errors"
    * assumption: `path === f` must return a file's error rows with and
    * without pushdown.
    */
  def errorRow(file: String, err: String, requestedId: String): InternalRow = {
    def valueOf(name: String): Any = name match {
      case "path"      => file
      case "record_id" => requestedId // null on plain scans
      case _           => null
    }
    val pass = (headerPreds.iterator ++ httpPreds.iterator).forall {
      case (name, p) => p(valueOf(name))
    }
    if (!pass) return null
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      val v = required.fields(i).name match {
        case "error" => err
        case n       => valueOf(n).asInstanceOf[String]
      }
      row.update(i, utf8OrNull(v))
      i += 1
    }
    row
  }

  private def utf8OrNull(s: String): AnyRef =
    if (s == null) null else UTF8String.fromString(s)
}

final case class WarcScan(
    dir: String, required: StructType, pushed: Array[Filter], limit: Int,
    bconf: Broadcast[SerializableHadoopConf])
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required

  /** RUNTIME filtering (the DSv2 dynamic-pruning hook): when this scan
    * feeds a join, Spark hands over the build side's key values as an
    * `In` filter before execution. Accepted filters join the pushed set
    * — evaluated pre-decode like any pushed predicate, and when the
    * runtime filter pins `record_id` over a corpus with a `_cdx`
    * sidecar, the scan RE-PLANS into index seeks: a join against a
    * small id set reads only the requested members' byte spans at
    * runtime, with no query rewrite. Over-returning is always safe
    * (Spark re-applies the join); the accepted filters are exact, so
    * nothing matching is ever dropped.
    */
  private var runtimeFilters: Array[Filter] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // attributes are resolved against the scan's (pruned) OUTPUT — offer
    // only the pushable columns the projection kept
    required.fieldNames.filter(WarcDataSourceV2.PushableCols).sorted
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    // accept exactly what pushFilters would; anything else is ignored
    // (the join still applies it)
    runtimeFilters = filters.filter {
      case EqualTo(a, v) => WarcDataSourceV2.PushableCols(a) && v != null
      case In(a, vs) => WarcDataSourceV2.PushableCols(a) && vs.nonEmpty && vs.forall(_ != null)
      case IsNotNull(a) => WarcDataSourceV2.PushableCols(a)
      case _ => false
    }
  }

  /** Pushed + runtime filters — what planning and the readers honor. */
  private def effectiveFilters: Array[Filter] = pushed ++ runtimeFilters
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WarcMicroBatchStream(dir, required, pushed, limit, bconf)
  override def description(): String =
    s"WarcScan($dir) ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      (if (limit >= 0) s", PushedLimit: $limit" else "")

  /** Size estimate for the join planner (the number that decides
    * broadcastability): Σ shard bytes, compressed shards scaled by a
    * conservative 4x expansion so an under-estimate never broadcasts a
    * side that then inflates past executor memory; a text-pruned
    * projection divides by 4 (payload dominates a crawl record); an
    * index-assisted record_id lookup is bounded by its request size.
    * Conservative by construction — the cost of over-estimating is a
    * missed broadcast, the cost of under-estimating is an OOM.
    */
  override def estimateStatistics(): Statistics = {
    val p = new Path(dir)
    val fs = p.getFileSystem(bconf.value.value)
    val ids = pinnedRecordIds
    val (size, rows): (Long, java.util.OptionalLong) =
      if (ids.isDefined && fs.exists(new Path(p, WarcDataSourceV2.IndexSidecar))) {
        // request-bounded seek scan: <= one record per pinned id
        (ids.get.size.toLong * 64 * 1024, java.util.OptionalLong.of(ids.get.size.toLong))
      } else {
        val stat = fs.getFileStatus(p)
        val files =
          if (stat.isDirectory)
            WarcDataSourceV2.listShards(fs, p).map(f => fs.getFileStatus(new Path(f)))
          else Seq(stat)
        val bytes = files.map { s =>
          val inflate = if (s.getPath.getName.endsWith(".warc")) 1L else 4L
          s.getLen * inflate
        }.sum
        // exact record count from the sidecar's parquet FOOTERS when the
        // corpus carries one — zero Spark jobs, the statistic a
        // metastore-backed scan answers from its catalog
        val nRows =
          if (stat.isDirectory) WarcDataSourceV2.sidecarRowCount(fs, p, bconf.value.value)
          else java.util.OptionalLong.empty()
        (if (required.fieldNames.contains("text")) bytes else math.max(1L, bytes / 4),
          nRows)
      }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(size)
      override def numRows(): java.util.OptionalLong = rows
    }
  }

  /** record_id literals pinned by the pushed OR runtime filters, when
    * they alone decide which records the scan can return — the
    * index-lookup shape.
    */
  private def pinnedRecordIds: Option[Seq[String]] = effectiveFilters.collectFirst {
    case EqualTo("record_id", v: String) => Seq(v)
    case In("record_id", vs) => vs.collect { case s: String => s }.toSeq
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(dir)
    val conf = bconf.value.value
    val fs = p.getFileSystem(conf)
    val stat = fs.getFileStatus(p)
    val idx = new Path(p, WarcDataSourceV2.IndexSidecar)
    val ids = pinnedRecordIds
    if (stat.isDirectory && ids.isDefined && fs.exists(idx)) {
      // CDX-assisted scan: plan seek partitions straight from the index
      // sidecar — one partition per touched FILE, each serving only the
      // requested members' byte spans (ascending offsets). The driver
      // collect is bounded by the predicate's literal count, never the
      // corpus. Contract: the sidecar indexes EVERY record of the corpus
      // (writeCorpusWithIndex writes both together), so "absent from the
      // index" == "absent from the corpus".
      import org.apache.spark.sql.functions.col
      val rows = SparkSession.active.read
        .schema(WarcDataSourceV2.IndexSchema).parquet(idx.toString)
        .filter(col("record_id").isin(ids.get: _*))
        .select("record_id", "path", "offset", "length")
        .collect()
      rows.groupBy(_.getString(1)).toSeq.sortBy(_._1).map { case (f, rs) =>
        WarcSeekPartition(f,
          rs.map(r => SeekSpan(r.getString(0), r.getLong(2), r.getLong(3)))
            .sortBy(_.offset).toIndexedSeq): InputPartition
      }.toArray
    } else {
      val files =
        if (stat.isDirectory) WarcDataSourceV2.listShards(fs, p)
        else Seq(p.toString)
      files.sorted.map(f => WarcInputPartition(f): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required, effectiveFilters, limit, bconf)
}

final case class WarcInputPartition(file: String) extends InputPartition

final case class SeekSpan(recordId: String, offset: Long, length: Long)
final case class WarcSeekPartition(file: String, spans: IndexedSeq[SeekSpan])
    extends InputPartition

final case class WarcReaderFactory(
    required: StructType, pushed: Array[Filter], limit: Int,
    bconf: Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case WarcInputPartition(file) =>
        new WarcPartitionReader(file, new RowShaper(required, pushed), limit, bconf)
      case WarcSeekPartition(file, spans) =>
        new WarcSeekReader(file, spans, new RowShaper(required, pushed), limit, bconf)
      case other => throw new IllegalStateException(s"unexpected partition $other")
    }
}

/** Full-shard streaming reader: parses the file record-by-record in
  * O(record) memory, skipping payload bytes the projection + pushed
  * predicates prove will never be consumed.
  */
final class WarcPartitionReader(
    file: String, shaper: RowShaper, limit: Int,
    bconf: Broadcast[SerializableHadoopConf])
    extends PartitionReader[InternalRow] {

  private val hp = new Path(file)
  private val in = hp.getFileSystem(bconf.value.value).open(hp)

  private val records = Warc.parseStream(in, Warc.codecOf(file),
    keepPayload = hs => shaper.needsPayload(file, hs))

  private var emitted = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    // pushed (partial) limit: stop PARSING once this partition has
    // produced enough rows — the rest of the shard is never read
    if (limit >= 0 && emitted >= limit) return false
    while (records.hasNext) {
      val row = records.next() match {
        case Right(rec) => shaper.recordRow(file, rec)
        case Left(err)  => shaper.errorRow(file, err, null)
      }
      if (row != null) { current = row; emitted += 1; return true }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

/** Index-seek reader: serves exactly the requested member spans with
  * ascending positioned reads — bytes read == Σ requested member
  * lengths, independent of shard or corpus size. An empty/corrupt span
  * or a stale index (the span now holds a DIFFERENT record) surfaces as
  * an error row carrying the REQUESTED record_id.
  */
final class WarcSeekReader(
    file: String, spans: IndexedSeq[SeekSpan], shaper: RowShaper, limit: Int,
    bconf: Broadcast[SerializableHadoopConf])
    extends PartitionReader[InternalRow] {

  private val hp = new Path(file)
  private val fs = hp.getFileSystem(bconf.value.value)
  private val in = fs.open(hp)
  // dictionary-compressed .warc.zst: seeked frames need the file-head
  // dictionary — loaded ONCE per partition (= per file)
  private lazy val dict: Option[Array[Byte]] =
    if (Warc.codecOf(file) == Warc.CodecZstd) Warc.readZstdDict(fs.open(hp)) else None
  private var i = 0
  private var current: InternalRow = _

  private def rowForSpan(s: SeekSpan): InternalRow = {
    if (s.length > Int.MaxValue - 8L)
      return shaper.errorRow(file, s"member too large to buffer (${s.length} bytes)", s.recordId)
    val buf = new Array[Byte](s.length.toInt)
    try in.readFully(s.offset, buf)
    catch {
      case e: java.io.IOException =>
        return shaper.errorRow(file,
          s"seek read failed at ${s.offset}+${s.length}: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}",
          s.recordId)
    }
    Warc.parseStream(new java.io.ByteArrayInputStream(buf), Warc.codecOf(file),
      keepPayload = hs => shaper.needsPayload(file, hs), zstdDict = dict)
      .take(1).toSeq.headOption match {
      case None => shaper.errorRow(file, s"empty member span at ${s.offset}+${s.length}", s.recordId)
      case Some(Left(err)) => shaper.errorRow(file, err, s.recordId)
      case Some(Right(rec)) if rec.recordId != s.recordId =>
        // stale index: the corpus was rewritten underneath its sidecar —
        // an error row for the REQUESTED id, never mis-attributed text
        shaper.errorRow(file, s"index mismatch: span at ${s.offset} holds '${rec.recordId}'", s.recordId)
      case Some(Right(rec)) => shaper.recordRow(file, rec)
    }
  }

  private var emitted = 0
  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (i < spans.length) {
      val row = rowForSpan(spans(i))
      i += 1
      if (row != null) { current = row; emitted += 1; return true }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------------------
// STREAMING read: landing-directory micro-batches
// ---------------------------------------------------------------------------

/** A streaming offset = the set of shard files the stream has seen.
  * Landing-dir semantics: shards arrive by atomic rename and are
  * immutable once visible (the crawl-fetcher contract), so file-set
  * difference IS the batch. The JSON form is a sorted array — stable
  * across restarts for the checkpoint log.
  *
  * Scale note: the offset grows with the directory's file count, like
  * the built-in file-stream source's seen-file log. A 100 TB landing
  * flow compacts by rotating the landing prefix (e.g. hourly dirs), the
  * same operational answer the built-in source documents.
  */
final case class WarcStreamOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.sorted.map(f =>
      "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object WarcStreamOffset {
  def fromJson(json: String): WarcStreamOffset = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inStr = false
    var esc = false
    json.foreach { c =>
      if (inStr) {
        if (esc) { sb.append(c); esc = false }
        else if (c == '\\') esc = true
        else if (c == '"') { inStr = false; out += sb.toString; sb.clear() }
        else sb.append(c)
      } else if (c == '"') inStr = true
    }
    WarcStreamOffset(out.result())
  }
}

final class WarcMicroBatchStream(
    dir: String, required: StructType, pushed: Array[Filter], limit: Int,
    bconf: Broadcast[SerializableHadoopConf])
    extends MicroBatchStream {

  private def listFiles(): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(bconf.value.value)
    if (!fs.exists(p)) Seq.empty
    else WarcDataSourceV2.listShards(fs, p).sorted
  }

  override def initialOffset(): Offset = WarcStreamOffset(Seq.empty)
  override def latestOffset(): Offset = WarcStreamOffset(listFiles())
  override def deserializeOffset(json: String): Offset = WarcStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcStreamOffset].files.toSet
    end.asInstanceOf[WarcStreamOffset].files.filterNot(seen).sorted
      .map(f => WarcInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required, pushed, limit, bconf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
