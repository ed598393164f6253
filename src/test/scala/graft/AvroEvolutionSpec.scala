package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ArchiveOps
import graft.sources.AvroIo

/** Avro depth beyond the v1 roundtrip: reader-schema EVOLUTION (alias
  * rename + defaulted new fields over old bytes) and LOGICAL TYPES
  * (timestamp-micros, bytes-decimal with schema-derived scale, snappy
  * blocks) — the format features a long-lived corpus leans on.
  */
class AvroEvolutionSpec extends SparkSpec {

  private def v1Bytes(docs: Seq[AvroIo.Doc]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    AvroIo.writeStream(bos, docs.iterator)
    bos.toByteArray
  }

  test("v1 bytes read under the v2 reader schema: alias rename + defaults filled") {
    val docs = Seq(
      AvroIo.Doc(1L, "first doc", "en", "web"),
      AvroIo.Doc(2L, "héllo → wörld", "de", "books"))
    val got = AvroIo.readDocV2(new ByteArrayInputStream(v1Bytes(docs))).toList
    assert(got.map(_.docId) == Seq(1L, 2L))
    assert(got.map(_.body) == Seq("first doc", "héllo → wörld")) // text -> body via alias
    assert(got.forall(_.quality == 0.25))                        // defaulted double
    assert(got.forall(_.tags == Seq.empty))                      // defaulted array
    assert(got.map(d => (d.lang, d.source)) == Seq(("en", "web"), ("de", "books")))
  }

  test("logical-typed event container: annotations verified from the FILE's schema") {
    val events = Seq(
      AvroIo.Event(1L, 1700000000000000L, "click", 12345L),
      AvroIo.Event(2L, 1700000000123456L, "view", -250L)) // negative decimal too
    val bos = new java.io.ByteArrayOutputStream()
    AvroIo.writeEvents(bos, events.iterator)
    val got = AvroIo.readEvents(new ByteArrayInputStream(bos.toByteArray)).toList
    assert(got == events) // micros exact, unscaled-bytes decimal exact (sign included)
  }

  test("the event reader REJECTS a container whose schema lacks the logical types") {
    // a plain-long/plain-bytes schema must not silently read as ts/amount
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"Event","namespace":"graft","fields":[
        | {"name":"event_id","type":"long"},
        | {"name":"ts","type":"long"},
        | {"name":"event_type","type":"string"},
        | {"name":"amount","type":"bytes"}]}""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, bos)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("event_id", 1L); rec.put("ts", 1L); rec.put("event_type", "x")
    rec.put("amount", java.nio.ByteBuffer.wrap(Array[Byte](1)))
    w.append(rec); w.close()
    intercept[IllegalArgumentException] {
      AvroIo.readEvents(new ByteArrayInputStream(bos.toByteArray)).toList
    }
  }

  test("q_avro_evolution matches the direct computation over the v1 corpus") {
    val df = SparkEntry.queries("q_avro_evolution")(spark, sfDir)
    val rows = df.collect()
    val want = Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(length(col("text")).cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty && rows.length == want.size)
    rows.foreach { r =>
      val (n, c) = (want(r.getString(0))._1, want(r.getString(0))._2)
      assert(r.getLong(1) == n && r.getLong(2) == c, r.toString)
      assert(r.getDouble(3) == n * 0.25, r.toString) // defaults summed exactly
    }
  }

  test("q_avro_logical matches the direct computation over events") {
    val df = SparkEntry.queries("q_avro_logical")(spark, sfDir)
    val got = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        unix_timestamp(min(col("ts"))).as("mn"),
        unix_timestamp(max(col("ts"))).as("mx"),
        (sum(floor(col("value") * 100).cast("long")).cast("double") / 100).as("amt"))
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == want && got.nonEmpty)
  }
}
