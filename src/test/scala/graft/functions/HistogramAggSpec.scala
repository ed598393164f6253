package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HistogramAggSpec extends SparkSpec {
  import spark.implicits._

  test("partial buffers merge correctly across many partitions") {
    val df = (1 to 1000).map(_.toDouble % 50).toDF("v").repartition(13)
    val hist = df.agg(GraftFunctions.histogram(col("v"), 0.0, 50.0, 10).as("h"))
      .select((0 until 10).map(k => col("h").getItem(k)): _*)
      .collect().head
    val counts = (0 until 10).map(hist.getLong)
    assert(counts.sum == 1000)
    // values 0..49 uniform-ish: each 5-wide bucket gets 100 per 500 values
    val expected = (0 until 10).map(k =>
      (1 to 1000).count(i => { val v = (i % 50).toDouble; v >= k * 5 && v < (k + 1) * 5 }).toLong)
    assert(counts == expected)
  }

  test("out-of-range values clamp into the edge buckets; nulls ignored") {
    val df = Seq(Some(-5.0), Some(0.0), Some(49.9), Some(99.0), None)
      .toDF("v")
    val hist = df.agg(GraftFunctions.histogram(col("v"), 0.0, 50.0, 10).as("h"))
      .select((0 until 10).map(k => col("h").getItem(k)): _*)
      .collect().head
    val counts = (0 until 10).map(hist.getLong)
    assert(counts.head == 2L)  // -5.0 clamped + 0.0
    assert(counts.last == 2L)  // 49.9 + 99.0 clamped
    assert(counts.sum == 4L)   // null ignored
  }
}
