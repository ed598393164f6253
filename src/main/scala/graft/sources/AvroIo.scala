package graft.sources

import java.io.{File, InputStream, OutputStream}
import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Avro object-container-file reader/writer for the document corpus,
  * built directly on the Avro Java library (`avro-1.12.1.jar` ships in
  * the Spark distribution; the separate `spark-avro` DATASOURCE module
  * does not, so the engine provides its own container-file path).
  *
  * Why Avro next to WARC: WARC is the crawl interchange format; Avro is
  * the row-oriented STRUCTURED interchange format (schema embedded in
  * the file header, per-block compression, sync markers every block).
  * Avro containers are actually splittable AT SYNC MARKERS — a cluster
  * deployment would scale by file count first (like WARC, thousands of
  * shards), and a custom FileFormat seeking to sync markers is the
  * further step a 100 TB lake could take; per-file streaming decode is
  * the format's standard first-class path and what this module does.
  *
  * Three format depths a long-lived corpus needs, all here:
  *  - the v1 Doc container (deflate blocks, embedded writer schema);
  *  - READER-SCHEMA EVOLUTION: v1 files resolved under the v2 reader
  *    schema ([[DocReaderV2Json]]) — field rename via alias, new fields
  *    filled from defaults — Avro's standard resolution rules, so old
  *    bytes serve new readers without a rewrite;
  *  - LOGICAL TYPES: the event container writes `timestamp-micros` over
  *    long and `decimal(18,2)` over bytes (unscaled big-endian
  *    two's-complement per the spec), snappy blocks; the reader takes
  *    the annotations from the FILE's schema, never a writer constant.
  */
object AvroIo {

  val DocSchemaJson: String =
    """{"type":"record","name":"Document","namespace":"graft",
      |"fields":[
      | {"name":"doc_id","type":"long"},
      | {"name":"text","type":"string"},
      | {"name":"lang","type":"string"},
      | {"name":"source","type":"string"}]}""".stripMargin

  /** v2 READER schema for the same container files: `text` is renamed
    * `body` (resolved against v1 via the alias), `quality`/`tags` are
    * new fields the old files never wrote — schema resolution fills
    * their defaults. Reading v1 bytes under this schema is the
    * add-a-column / rename-a-column evolution path.
    */
  val DocReaderV2Json: String =
    """{"type":"record","name":"Document","namespace":"graft",
      |"fields":[
      | {"name":"doc_id","type":"long"},
      | {"name":"body","aliases":["text"],"type":"string"},
      | {"name":"lang","type":"string"},
      | {"name":"source","type":"string"},
      | {"name":"quality","type":"double","default":0.25},
      | {"name":"tags","type":{"type":"array","items":"string"},"default":[]}]}""".stripMargin

  /** Event container schema with LOGICAL TYPES: ts = timestamp-micros
    * over long; amount = decimal(18,2) over bytes (unscaled big-endian
    * two's-complement, the Avro spec encoding).
    */
  val EventSchemaJson: String =
    """{"type":"record","name":"Event","namespace":"graft",
      |"fields":[
      | {"name":"event_id","type":"long"},
      | {"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},
      | {"name":"event_type","type":"string"},
      | {"name":"amount","type":{"type":"bytes","logicalType":"decimal","precision":18,"scale":2}}]}""".stripMargin

  // Schema is not serializable-friendly across closures in older Avro;
  // parse per task from the JSON string.
  def docSchema(): Schema = new Schema.Parser().parse(DocSchemaJson)
  def docReaderV2Schema(): Schema = new Schema.Parser().parse(DocReaderV2Json)
  def eventSchema(): Schema = new Schema.Parser().parse(EventSchemaJson)

  final case class Doc(docId: Long, text: String, lang: String, source: String)

  /** The v2 evolved view of a v1 Doc (quality/tags filled from the
    * reader schema's defaults).
    */
  final case class DocV2(
      docId: Long, body: String, lang: String, source: String,
      quality: Double, tags: Seq[String])

  /** One event row for the logical-typed container. `cents` is the
    * decimal's unscaled value at scale 2 — exact integer arithmetic on
    * both sides of the container boundary.
    */
  final case class Event(eventId: Long, tsMicros: Long, eventType: String, cents: Long)

  /** Write one container file; deflate-compressed blocks, 64 KiB sync
    * interval (the block size bounds both decode memory and the
    * granularity a sync-seeking splitter could use).
    */
  def writeFile(path: File, docs: Iterator[Doc]): Unit =
    writeStream(new java.io.FileOutputStream(path), docs)

  /** [[writeFile]] over ANY sink stream — a Hadoop `FileSystem.create`
    * stream writes containers to whatever storage the job's
    * configuration points at, exactly like the built-in file sinks. The
    * writer owns (closes) the stream.
    */
  def writeStream(sink: OutputStream, docs: Iterator[Doc]): Unit = {
    val schema = docSchema()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    // own the output stream: DataFileWriter.close() is a no-op unless
    // create() fully succeeded, so a failure during the header write
    // would otherwise leak the fd (close twice is idempotent)
    val out = new java.io.BufferedOutputStream(sink, 1 << 16)
    try {
      w.setCodec(CodecFactory.deflateCodec(6))
      w.setSyncInterval(64 * 1024)
      w.create(schema, out)
      docs.foreach { d =>
        val rec = new GenericData.Record(schema)
        rec.put("doc_id", d.docId)
        rec.put("text", d.text)
        rec.put("lang", d.lang)
        rec.put("source", d.source)
        w.append(rec)
      }
    } finally {
      try w.close()
      finally out.close()
    }
  }

  /** Stream-decode one container file. The schema is read from the FILE
    * header (writer schema), so this also proves schema fidelity — the
    * reader never sees `DocSchemaJson`. Caller owns the stream.
    */
  def readStream(in: InputStream): Iterator[Doc] = {
    val r = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    new Iterator[Doc] {
      def hasNext: Boolean = r.hasNext
      def next(): Doc = {
        val rec = r.next()
        Doc(
          rec.get("doc_id").asInstanceOf[Long],
          rec.get("text").toString,
          rec.get("lang").toString,
          rec.get("source").toString)
      }
    }
  }

  /** Stream-decode a v1 container under the v2 READER schema: the
    * datum reader resolves writer-vs-reader (alias for the rename,
    * defaults for the added fields) — standard Avro schema resolution,
    * exercised end-to-end.
    */
  def readDocV2(in: InputStream): Iterator[DocV2] = {
    val reader = new GenericDatumReader[GenericRecord](null, docReaderV2Schema())
    val r = new DataFileStream[GenericRecord](in, reader)
    new Iterator[DocV2] {
      def hasNext: Boolean = r.hasNext
      def next(): DocV2 = {
        val rec = r.next()
        val tags = rec.get("tags").asInstanceOf[java.util.List[AnyRef]]
        DocV2(
          rec.get("doc_id").asInstanceOf[Long],
          rec.get("body").toString,
          rec.get("lang").toString,
          rec.get("source").toString,
          rec.get("quality").asInstanceOf[Double],
          {
            val b = Seq.newBuilder[String]
            tags.forEach(t => b += t.toString)
            b.result()
          })
      }
    }
  }

  /** Write one logical-typed event container (snappy blocks). The
    * decimal is encoded per the Avro spec: the unscaled value's
    * big-endian two's-complement bytes.
    */
  def writeEvents(sink: OutputStream, events: Iterator[Event]): Unit = {
    val schema = eventSchema()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    val out = new java.io.BufferedOutputStream(sink, 1 << 16)
    try {
      w.setCodec(CodecFactory.snappyCodec())
      w.setSyncInterval(64 * 1024)
      w.create(schema, out)
      events.foreach { e =>
        val rec = new GenericData.Record(schema)
        rec.put("event_id", e.eventId)
        rec.put("ts", e.tsMicros)
        rec.put("event_type", e.eventType)
        rec.put("amount", ByteBuffer.wrap(BigInteger.valueOf(e.cents).toByteArray))
        w.append(rec)
      }
    } finally {
      try w.close()
      finally out.close()
    }
  }

  /** Stream-decode a logical-typed event container, VERIFYING the
    * annotations in the file's own schema: ts must be timestamp-micros,
    * amount a bytes-decimal whose scale comes from the schema (the
    * reader rescales to cents rather than assuming the writer constant).
    */
  def readEvents(in: InputStream): Iterator[Event] = {
    val r = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    val schema = r.getSchema
    val tsType = schema.getField("ts").schema().getLogicalType
    require(tsType != null && tsType.getName == "timestamp-micros",
      s"avro events: ts logicalType is ${Option(tsType).map(_.getName).orNull}, expected timestamp-micros")
    val amountType = schema.getField("amount").schema().getLogicalType
    require(amountType.isInstanceOf[LogicalTypes.Decimal],
      s"avro events: amount logicalType is ${Option(amountType).map(_.getName).orNull}, expected decimal")
    val scale = amountType.asInstanceOf[LogicalTypes.Decimal].getScale
    new Iterator[Event] {
      def hasNext: Boolean = r.hasNext
      def next(): Event = {
        val rec = r.next()
        val bb = rec.get("amount").asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining())
        bb.duplicate().get(bytes)
        val unscaled = new java.math.BigDecimal(new BigInteger(bytes), scale)
        Event(
          rec.get("event_id").asInstanceOf[Long],
          rec.get("ts").asInstanceOf[Long],
          rec.get("event_type").toString,
          // rescale to cents exactly; throws on a lossy rescale (a
          // corrupt container must be loud, not silently rounded)
          unscaled.movePointRight(2).longValueExact())
      }
    }
  }
}
