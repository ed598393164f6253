package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver's parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `$dir/`. All reads go through here so
  * every query benefits from the same conventions (explicit path, no schema
  * inference surprises, columnar parquet scan with pushdown left to
  * Catalyst).
  */
object Tables {
  /** Catalog-style schema cache. A bare `spark.read.parquet(path)` must
    * INFER the schema, and Spark 4 does that with a footer-reading Spark
    * JOB — a fixed ~30 ms + scheduling-gap tax paid again by every query
    * (measured: the leading scan-callsite job on every TimeQ trace). A
    * production engine never pays it: table schemas live in the catalog
    * and scans are planned against stored metadata. This cache is that
    * catalog: infer once per (dir, table) per JVM, then hand the stored
    * schema to every later read. Fixture files are immutable for a
    * session; a long-lived service wrapping this would invalidate on
    * table replacement exactly like a metastore refresh.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** Footer row-count catalog: exact table cardinality summed from the
    * parquet block metadata — ZERO Spark jobs, the statistics read a
    * metastore-backed engine answers from its catalog. Callers use it
    * to size data structures (bloom sketches) and gate physical paths
    * the way the planner uses table stats; cached like the schema.
    */
  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    rowCountCache.computeIfAbsent(s"$dir/$name.parquet", path => {
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      def footerRows(f: org.apache.hadoop.fs.Path): Long = {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asInstanceOf[java.util.List[
          org.apache.parquet.hadoop.metadata.BlockMetaData]]
          .stream().mapToLong(_.getRowCount).sum()
        finally r.close()
      }
      val st = fs.getFileStatus(root)
      if (st.isDirectory)
        fs.listStatus(root).iterator
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => footerRows(s.getPath)).sum
      else footerRows(root)
    })

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` normalization — every downstream query assumes a plain
    * (UTC-instant) TimestampType:
    *
    *  - ns-precision parquet (FIXTURES.md) Spark 4 refuses to read as a
    *    timestamp (PARQUET_TYPE_ILLEGAL). Sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, so the column arrives
    *    as LONG nanoseconds; convert by integer division (truncation —
    *    same as DuckDB's TIMESTAMP_NS → TIMESTAMP cast).
    *  - µs parquet with isAdjustedToUTC=false arrives as TIMESTAMP_NTZ
    *    (Spark's NTZ inference), which `unix_micros` et al. reject; cast
    *    to TimestampType. Every session pins
    *    `spark.sql.session.timeZone=UTC`, so the NTZ wall-clock maps to
    *    the same instant DuckDB's naive-as-UTC `epoch_us` computes.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
