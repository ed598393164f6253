package graft.sources.warc

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Warc

/** DataSourceV2 connector for WARC corpora: `spark.read.format("warc")
  * .load(dir)` (registered via DataSourceRegister). One InputPartition
  * per shard file — the format's unit of parallelism — with two
  * Catalyst integrations the RDD helper cannot express:
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): when the
  *    projection doesn't need `text`, the reader SKIPS every payload
  *    (no buffering, no gunzip-to-byte[], no UTF-8 decode) — a
  *    metadata-only scan over a crawl reads headers only, the
  *    `ReadSchema`-discipline analog for an archive format.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): `EqualTo` on the
  *    header-level columns (warc_type / record_id / target_uri / lang /
  *    source / path) is evaluated BEFORE the payload is touched, so
  *    filtered-out records cost a skip, not a decode. `text`/`error`
  *    predicates are not accepted (they need the parse result) and stay
  *    with Spark.
  *
  * Error rows carry only `path`+`error`; every accepted EqualTo
  * therefore excludes them (SQL equality never matches NULL), which the
  * reader honors. Schema is fixed (`WarcTableSchema`) — WARC has no
  * embedded schema to infer.
  */
class WarcDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSourceV2.Schema
  // writes hand the incoming frame's schema to getTable (reads still
  // come through inferSchema's fixed record schema) — the write frame
  // is the 4-column corpus shape, not the 8-column record shape
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
  val Schema: StructType = StructType(
    Seq("path", "warc_type", "record_id", "target_uri", "lang", "source", "text", "error")
      .map(StructField(_, StringType, nullable = true)))

  /** Header-level columns whose EqualTo can be answered before payload
    * decode; maps column name -> header lookup.
    */
  private[warc] def headerField(
      name: String, path: String, warcType: String,
      recordId: String, targetUri: String,
      headers: Map[String, String]): String = name match {
    case "path"       => path
    case "warc_type"  => warcType
    case "record_id"  => recordId
    case "target_uri" => targetUri
    case "lang"       => headers.getOrElse("X-Graft-Lang", null)
    case "source"     => headers.getOrElse("X-Graft-Source", null)
    case _            => null
  }

  private[warc] val PushableCols =
    Set("path", "warc_type", "record_id", "target_uri", "lang", "source")
}

final class WarcTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"warc($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(dir)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WarcWriteBuilder(dir, info)
}

/** Batch write: `df.write.format("warc").mode("append").save(dir)`.
  * Input schema must carry (doc_id, text, lang, source) — the corpus
  * row shape. Each task writes ONE shard, to a hidden temp file; the
  * driver-side commit renames every temp into place and abort deletes
  * them, so a failed/speculative task attempt never leaves a partial
  * shard visible — the connector's own commit protocol, same contract
  * as the built-in file sinks. Codec via `.option("codec",
  * none|gzip|zstd)`, default gzip (the crawl layout).
  */
final class WarcWriteBuilder(dir: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val schema = info.schema()
      val need = Seq("doc_id", "text", "lang", "source")
      val missing = need.filterNot(schema.fieldNames.contains)
      require(missing.isEmpty,
        s"warc write needs columns ${need.mkString(", ")}; missing: ${missing.mkString(", ")}")
      val codec = Option(info.options.get("codec")).getOrElse(Warc.CodecGzip)
      Warc.extOf(codec) // fail at planning on an unknown codec
      new WarcBatchWrite(dir, schema, codec, info.queryId)
    }
  }
}

final class WarcBatchWrite(dir: String, schema: StructType, codec: String, queryId: String)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    WarcWriterFactory(dir, schema, codec, queryId)

  private def fs = new Path(dir).getFileSystem(
    SparkSession.active.sessionState.newHadoopConf())

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    f.mkdirs(new Path(dir))
    messages.foreach {
      case WarcCommit(temp, finalName) if temp.nonEmpty =>
        val ok = f.rename(new Path(temp), new Path(new Path(dir), finalName))
        require(ok, s"warc commit: rename $temp -> $finalName failed")
      case _ => () // empty partition: nothing to publish
    }
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

final case class WarcWriterFactory(dir: String, schema: StructType, codec: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, schema, codec, queryId, partitionId, taskId)
}

final class WarcDataWriter(
    dir: String, schema: StructType, codec: String,
    queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val iDoc = schema.fieldIndex("doc_id")
  private val iText = schema.fieldIndex("text")
  private val iLang = schema.fieldIndex("lang")
  private val iSource = schema.fieldIndex("source")
  private val finalName = f"part-$partitionId%05d.${Warc.extOf(codec)}"
  // temp name contains NO ".warc" substring (a crashed attempt must
  // never match a scan glob) and is unique per task ATTEMPT, so a
  // speculative duplicate can never clobber
  private val temp = new java.io.File(dir, s".tmp-$queryId-$taskId-$partitionId")
  locally { val p = temp.getParentFile; if (p != null) { p.mkdirs(); () } }
  private var writer: Warc.WarcShardWriter = _
  private var open = false

  override def write(row: InternalRow): Unit = {
    if (!open) { writer = Warc.shardWriter(temp, codec); open = true }
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
    if (open) { writer.close(); WarcCommit(temp.getAbsolutePath, finalName) }
    // empty partition: publish nothing (the driver skips empty commits)
    else WarcCommit("", "")
  override def abort(): Unit = {
    if (open) writer.close()
    temp.delete(); ()
  }
  override def close(): Unit = ()
}

final class WarcScanBuilder(dir: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WarcDataSourceV2.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo(a, _: String) => WarcDataSourceV2.PushableCols(a)
      // In with non-null string values: a null header never matches,
      // which is exactly SQL's `x IN (...)` null semantics
      case In(a, vs) =>
        WarcDataSourceV2.PushableCols(a) && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = WarcScan(dir, required, pushed)
}

final case class WarcScan(dir: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan($dir) ReadSchema: ${required.simpleString}, PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(dir)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    val stat = fs.getFileStatus(p)
    val files =
      if (stat.isDirectory) fs.globStatus(new Path(p, "*.warc*")).map(_.getPath.toString)
      else Array(p.toString)
    files.sorted.map(f => WarcInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required, pushed)
}

final case class WarcInputPartition(file: String) extends InputPartition

final case class WarcReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].file, required, pushed)
}

final class WarcPartitionReader(file: String, required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  import WarcDataSourceV2.headerField

  private val hp = new Path(file)
  private val in = hp.getFileSystem(new Configuration()).open(hp)
  private val needText = required.fieldNames.contains("text")
  private val preds: Array[(String, String => Boolean)] = pushed.collect {
    case EqualTo(a, v: String) => (a, (x: String) => x == v)
    case In(a, vs) =>
      val set = vs.collect { case s: String => s }.toSet
      (a, (x: String) => x != null && set.contains(x))
  }

  private def headerPass(headers: Map[String, String]): Boolean = {
    def get(k: String): String =
      headers.iterator.collectFirst { case (hk, v) if hk.equalsIgnoreCase(k) => v }.orNull
    preds.forall { case (name, p) =>
      p(headerField(name, file, get("WARC-Type"), get("WARC-Record-ID"),
        get("WARC-Target-URI"), headers))
    }
  }

  // payload decode only when the record passes every pushed filter AND
  // the projection needs text
  private val records = Warc.parseStream(in, Warc.codecOf(file),
    keepPayload = hs => needText && headerPass(hs))

  private var current: InternalRow = _

  private def toRow(e: Either[String, Warc.WarcRecord]): InternalRow = e match {
    case Right(rec) =>
      if (!headerPass(rec.headers)) null
      else {
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          val v = required.fields(i).name match {
            case "text" => new String(rec.payload, java.nio.charset.StandardCharsets.UTF_8)
            case "error" => null
            case n => headerField(n, file, rec.warcType, rec.recordId,
              rec.targetUri.orNull, rec.headers)
          }
          row.update(i, if (v == null) null else UTF8String.fromString(v))
          i += 1
        }
        row
      }
    case Left(err) =>
      // an error row is NULL in every header column, so any pushed
      // EqualTo/In excludes it (SQL null semantics)
      if (preds.nonEmpty) null
      else {
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          val v = required.fields(i).name match {
            case "path" => file
            case "error" => err
            case _ => null
          }
          row.update(i, if (v == null) null else UTF8String.fromString(v))
          i += 1
        }
        row
      }
  }

  override def next(): Boolean = {
    while (records.hasNext) {
      val row = toRow(records.next())
      if (row != null) { current = row; return true }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
