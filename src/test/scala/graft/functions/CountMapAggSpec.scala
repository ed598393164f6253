package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The capped count-map aggregation buffers behind the observe-riding
  * model-state passes (LM type table, decile histograms). Pins the two
  * contracts a checkpoint job depends on: exact counts under the cap
  * with ARBITRARY-LENGTH keys (the serializer is length-prefixed UTF-8,
  * not writeUTF — one >64 KiB token must stay data, not a crash), and
  * the overflow-poison → null fallback signal.
  */
class CountMapAggSpec extends SparkSpec {
  import spark.implicits._

  test("elem_counts: exact counts; a >64KiB key survives serialization") {
    // writeUTF caps modified-UTF-8 keys at 65535 bytes — a single
    // unbroken blob token (base64 runs are common in crawl text) must
    // round-trip the partial-aggregate shuffle, not throw
    val blob = "A" * 70000
    val rows = Seq(
      Seq("a", "b", blob), Seq("a", blob), Seq("b"), Seq.empty[String])
    val got = rows.toDF("ws").repartition(4)
      .agg(GraftFunctions.elem_counts(col("ws"), 10).as("m"))
      .collect().head.getMap[String, Long](0)
    assert(got.toMap == Map("a" -> 2L, "b" -> 2L, blob -> 2L))
  }

  test("elem_counts: non-ascii + supplementary keys round-trip exactly") {
    val keys = Seq("café", "😀", "日本語")
    val got = Seq(keys).toDF("ws").repartition(3)
      .agg(GraftFunctions.elem_counts(col("ws"), 10).as("m"))
      .collect().head.getMap[String, Long](0)
    assert(got.toMap == keys.map(_ -> 1L).toMap)
  }

  test("overflow past maxKeys poisons to null (the distributed-fallback signal)") {
    val rows = (0 until 20).map(i => Seq(s"k$i"))
    val r = rows.toDF("ws").repartition(4)
      .agg(GraftFunctions.elem_counts(col("ws"), 8).as("m"))
      .collect().head
    assert(r.isNullAt(0), "overflowed buffer must eval to null")
  }

  test("direct serialize/deserialize round-trip with a long key") {
    val agg = ElemCountMapAgg(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), maxKeys = 4)
    val buf = agg.createAggregationBuffer()
    val big = "é" * 40000 // 80000 UTF-8 bytes — past writeUTF's limit
    buf.add(big, 3L)
    buf.add("x", 1L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(!back.poisoned)
    assert(back.m.get(big) == 3L && back.m.get("x") == 1L && back.m.size() == 2)
  }
}
