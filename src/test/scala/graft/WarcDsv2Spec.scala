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
    val names = new java.io.File(dir).list().sorted.toSeq
    assert(names.nonEmpty && names.forall(_.endsWith(".warc.zst")), names.toString)
    assert(!names.exists(_.contains("tmp")), s"uncommitted temp left behind: $names")
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

  test("q_warc_pushdown matches the direct computation") {
    val df = SparkEntry.queries("q_warc_pushdown")(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Tables.documents(spark, sfDir).filter(col("source") === "src7")
      .groupBy("lang").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty)
  }
}
