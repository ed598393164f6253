package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-input behavior (SURVEY.md §1.2 error-channel row): Spark has
  * no per-row exception channel, so bad source rows must land in
  * PERMISSIVE-mode `_corrupt_record` — never kill the job, never vanish.
  * The engine analog of the reference's 400/500 http.Error sites.
  */
class SourcesSpec extends SparkSpec {

  test("PERMISSIVE json read keeps corrupt rows in _corrupt_record") {
    val dir = Files.createTempDirectory("graft_corrupt").toFile
    Files.writeString(new java.io.File(dir, "data.json").toPath,
      """{"id": 1, "v": 10.5}
        |not json at all {{{
        |{"id": 2, "v": 20.5}
        |{"id": "wrong-type", "v": 30.0}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.getAbsolutePath)
      .cache() // corrupt-record column requires a materialized scan
    assert(df.count() == 4) // no row dropped
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 2) // garbage line + type mismatch
    assert(df.filter(col("id") === 1 && col("v") === 10.5).count() == 1)
    df.unpersist()
  }

  test("FAILFAST mode surfaces the malformed row as an error instead") {
    val dir = Files.createTempDirectory("graft_failfast").toFile
    Files.writeString(new java.io.File(dir, "data.json").toPath,
      "{\"id\": 1}\nbroken{{{\n")
    val schema = StructType(Seq(StructField("id", LongType)))
    val ex = intercept[Exception] {
      spark.read.schema(schema).option("mode", "FAILFAST")
        .json(dir.getAbsolutePath).collect()
    }
    assert(ex.getMessage != null)
  }
  test("Tables.rowCount reads exact cardinality from parquet footers") {
    // the catalog-statistics read must agree with a full count at every
    // generated SF, for a single-file table and the widest one
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      Seq("supplier", "lineitem", "documents").foreach { t =>
        assert(Tables.rowCount(spark, dir, t) == Tables(spark, dir, t).count(),
          s"footer row count diverges for $dir/$t")
      }
    }
  }
}
