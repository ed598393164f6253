package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** NearestCentroid must be bit-identical to the declarative spelling it
  * replaced (zip_with + aggregate left fold, array_min over (dist, k)
  * structs) on arbitrary float vectors — same IEEE accumulation order,
  * same smallest-id tie-break — and its interpreted eval must agree
  * with the codegen path.
  */
class NearestCentroidSpec extends SparkSpec {

  private val dims = 7
  private val cents: Seq[(Long, Seq[Double])] = Seq(
    3L -> Seq(0.25, -1.5, 2.0, 0.1, -0.75, 3.25, 1.125),
    7L -> Seq(1.0, 1.0, -2.5, 0.5, 0.0, -1.25, 2.75),
    9L -> Seq(-0.5, 2.25, 0.75, -3.0, 1.5, 0.25, -1.0))

  /** The declarative spelling the native expression mirrors. */
  private def foldSpelling(emb: org.apache.spark.sql.Column) =
    array_min(array(cents.map { case (ck, carr) =>
      struct(
        aggregate(
          zip_with(emb, typedLit(carr),
            (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
          lit(0.0), (acc, t) => acc + t).as("dist"),
        lit(ck).as("k"))
    }: _*))

  test("native NearestCentroid == zip_with/aggregate fold on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(dims, Gen.chooseNum(-10.0f, 10.0f))
    val cases = (0 until 80)
      .flatMap(i => vecGen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .map(_.toArray)
    val df = cases.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding")
    val rows = df.select(
      col("id"),
      GraftFunctions.nearest_centroid(
        col("embedding"), cents.map(_._1), cents.map(_._2)).as("n"),
      foldSpelling(col("embedding")).as("f"))
      .select(col("id"),
        col("n.dist"), col("n.k"), col("f.dist").as("fd"), col("f.k").as("fk"))
      .collect()
    rows.foreach { r =>
      // bit-identical distance (same left fold), same centroid id
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"dist mismatch at ${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(4), s"centroid mismatch at ${r.getLong(0)}")
    }
  }

  test("ties break to the smallest centroid id") {
    import spark.implicits._
    // a vector equidistant from two centroids: ids 2 and 5, both at
    // squared distance 1 from the origin probe
    val tieCents = Seq(2L -> Seq(1.0, 0.0), 5L -> Seq(-1.0, 0.0))
    val df = Seq((1L, Array(0f, 0f))).toDF("id", "embedding")
    val r = df.select(GraftFunctions.nearest_centroid(
      col("embedding"), tieCents.map(_._1), tieCents.map(_._2)).as("n"))
      .select(col("n.k"), col("n.dist")).head()
    assert(r.getLong(0) == 2L && r.getDouble(1) == 1.0)
  }

  test("dimension mismatch yields null, and interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, 2f))).toDF("id", "embedding")
    def run(codegen: String) = {
      val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      try {
        spark.conf.set("spark.sql.codegen.factoryMode", codegen)
        df.select(col("id"), GraftFunctions.nearest_centroid(
          col("embedding"), Seq(0L), Seq(Seq(1.0, 1.0))).as("n"))
          .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap
      } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp)
    assert(gen(1L).isEmpty)  // 3-dim vector vs 2-dim centroid -> null
    assert(gen(2L).nonEmpty) // matching dims -> struct
  }

  test("rejects unsorted or empty centroid ids") {
    intercept[IllegalArgumentException](
      NearestCentroid(null, Seq(5L, 2L), Seq(Seq(1.0), Seq(2.0))))
    intercept[IllegalArgumentException](
      NearestCentroid(null, Seq.empty, Seq.empty))
  }
}
