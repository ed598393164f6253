package graft.sources

import java.io.{File, InputStream}

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Avro object-container-file reader/writer for the document corpus,
  * built directly on the Avro Java library (`avro-1.12.1.jar` ships in
  * the Spark distribution; the separate `spark-avro` DATASOURCE module
  * does not, so the engine provides its own container-file path).
  *
  * Why Avro next to WARC: WARC is the crawl interchange format; Avro is
  * the row-oriented STRUCTURED interchange format (schema embedded in
  * the file header, per-block deflate, sync markers every block). Avro
  * containers are actually splittable AT SYNC MARKERS — a cluster
  * deployment would scale by file count first (like WARC, thousands of
  * shards), and a custom FileFormat seeking to sync markers is the
  * further step a 100 TB lake could take; per-file streaming decode is
  * the format's standard first-class path and what this module does.
  */
object AvroIo {

  val DocSchemaJson: String =
    """{"type":"record","name":"Document","namespace":"graft",
      |"fields":[
      | {"name":"doc_id","type":"long"},
      | {"name":"text","type":"string"},
      | {"name":"lang","type":"string"},
      | {"name":"source","type":"string"}]}""".stripMargin

  // Schema is not serializable-friendly across closures in older Avro;
  // parse per task from the JSON string.
  def docSchema(): Schema = new Schema.Parser().parse(DocSchemaJson)

  final case class Doc(docId: Long, text: String, lang: String, source: String)

  /** Write one container file; deflate-compressed blocks, 64 KiB sync
    * interval (the block size bounds both decode memory and the
    * granularity a sync-seeking splitter could use).
    */
  def writeFile(path: File, docs: Iterator[Doc]): Unit = {
    val schema = docSchema()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    // own the output stream: DataFileWriter.close() is a no-op unless
    // create() fully succeeded, so a failure during the header write
    // would otherwise leak the fd (close twice is idempotent)
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path), 1 << 16)
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
}
