package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.ops.Exact

/** Parity of the two-long decimal sum with Spark's built-in decimal Sum —
  * the built-in is the executable specification; Dec128SumAgg is the
  * allocation-free hot path every Exact.dsum/decSum query runs. Random
  * inputs cross the 10^18 carry boundary in both directions (values up
  * to ±9e8 sum past one radix unit within ~1100 rows), and the
  * many-partition frame forces real partial/merge traffic.
  */
class Dec128SumSpec extends SparkSpec {
  import spark.implicits._

  private val dec = org.apache.spark.sql.types.DecimalType(38, 10)

  private def sumCast(c: org.apache.spark.sql.Column) =
    sum(c.cast(dec)).cast("double")

  test("grouped dec128 sum == built-in decimal sum (random, carries, negatives)") {
    val vals = Gen.listOfN(4000,
      Gen.chooseNum(-9.9e7, 9.9e7)).sample.getOrElse(Nil)
      .zipWithIndex.map { case (v, i) => (i % 7, v) }
    val df = vals.toDF("g", "x").repartition(13)
    val got = df.groupBy("g").agg(Exact.dsum(col("x")).as("s")).orderBy("g").collect()
    val exp = df.groupBy("g").agg(sumCast(col("x")).as("s")).orderBy("g").collect()
    assert(got.map(_.getDouble(1)).toSeq == exp.map(_.getDouble(1)).toSeq)
  }

  test("all-null group is null; nulls are skipped; empty relation sums to null") {
    val df = Seq[(Int, Option[Double])](
      (1, Some(2.5)), (1, None), (2, None), (2, None)).toDF("g", "x")
    val rows = df.groupBy("g").agg(Exact.dsum(col("x")).as("s")).orderBy("g").collect()
    assert(rows(0).getDouble(1) == 2.5 && rows(1).isNullAt(1))
    val empty = spark.range(0).toDF("id")
      .agg(Exact.dsum(col("id").cast("double"))).head
    assert(empty.isNullAt(0))
  }

  test("windowed dec128 sum == built-in windowed decimal sum") {
    val vals = Gen.listOfN(500, Gen.chooseNum(-1.0e6, 1.0e6)).sample.getOrElse(Nil)
      .zipWithIndex.map { case (v, i) => (i % 5, i, v) }
    val df = vals.toDF("g", "i", "x")
    val w = Window.partitionBy("g").orderBy("i").rowsBetween(-2, 0)
    val got = df.select(col("i"), Exact.decSum(col("x")).over(w).cast("double").as("s"))
      .orderBy("i").collect().map(_.getDouble(1)).toSeq
    val exp = df.select(col("i"), sum(col("x").cast(dec)).over(w).cast("double").as("s"))
      .orderBy("i").collect().map(_.getDouble(1)).toSeq
    assert(got == exp)
  }

  test("per-value magnitude past the two-long range fails loudly") {
    val e = intercept[Exception] {
      Seq(1.0e9).toDF("x").agg(Exact.dsum(col("x"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("Exact.dsum")), s"got: $e")
  }

  test("unscaledFromDouble fast path == BigDecimal reference on millions of samples") {
    val rnd = new scala.util.Random(42)
    def check(d: Double): Unit =
      assert(Dec128.unscaledFromDouble(d) == Dec128.unscaledFromDoubleReference(d),
        s"fast path diverged for $d")
    // clean k-decimal values across the fast-path magnitude range
    for (_ <- 1 to 500000) {
      val digits = rnd.nextInt(11)
      val mag = math.pow(10.0, rnd.nextInt(6) - 1)
      val v = math.rint(rnd.nextDouble() * mag * math.pow(10.0, digits)) /
        math.pow(10.0, digits)
      check(if (rnd.nextBoolean()) v else -v)
    }
    // full-precision doubles (fail the round-trip, exercise the handoff)
    for (_ <- 1 to 500000) {
      val v = (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(9) - 3)
      check(v)
    }
    // adversaries: magnitude-guard boundary, grid midpoints, tiny ulps
    Seq(131071.9999999999, 131072.0000000001, 131072.5, -131071.5,
      0.00000000005, 0.00000000015, 1.00000000005, 99999.99999999995,
      65535.99999999995, 0.1 + 0.2, 1.0 / 3.0, math.Pi * 1e4,
      4.9e-324, -4.9e-324, 0.0, -0.0).foreach(check)
  }

  test("decimal-typed child (no double cast) also sums exactly") {
    val df = Seq("1.5", "2.25", "-0.75").toDF("s")
      .select(col("s").cast(dec).as("d"))
    val got = org.apache.spark.sql.GraftBridge.column(
      Dec128SumAgg(org.apache.spark.sql.GraftBridge.expression(col("d")))
        .toAggregateExpression())
    assert(df.agg(got.cast("double")).head.getDouble(0) == 3.0)
  }
}
