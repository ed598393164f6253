package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** SimHash64 must equal an independently-spelled reference (hex-string
  * arithmetic, like the DuckDB oracle computes it) on arbitrary word
  * lists — including ties (sum == 0 → bit 0) and unicode words.
  */
class SimHash64Spec extends SparkSpec {

  private def refSimhash(ws: Seq[String]): String = {
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    ws.foreach { w =>
      val hex = md.digest(w.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(16)
      for (k <- 0 until 64) {
        val nibble = Integer.parseInt(hex(k / 4).toString, 16)
        val bit = (nibble / (1 << (3 - k % 4))) % 2
        counts(k) += (if (bit == 1) 1 else -1)
      }
    }
    (0 until 16).map { j =>
      val v = (0 until 4).map(b => if (counts(4 * j + b) > 0) 1 << (3 - b) else 0).sum
      "0123456789abcdef".charAt(v)
    }.mkString
  }

  test("native SimHash64 == hex-arithmetic reference on random word lists") {
    import spark.implicits._
    val wordGen = Gen.frequency(
      8 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      1 -> Gen.oneOf("naïve", "日本語", "Ωμέγα", "a b", ""))
    val listsGen = Gen.nonEmptyListOf(wordGen)
    val cases = (0 until 60)
      .flatMap(i => listsGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = cases.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "ws")
    val got = df
      .select(col("id"), GraftFunctions.simhash64(col("ws")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case (ws, i) =>
      assert(got(i.toLong) == refSimhash(ws), s"words=$ws")
    }
  }

  test("interpreted eval agrees with codegen path") {
    val words = Seq("the", "quick", "fox", "the")
    import spark.implicits._
    val df = Seq((1L, words)).toDF("id", "ws")
    val viaExpr = df.select(GraftFunctions.simhash64(col("ws")))
      .collect().head.getString(0)
    assert(viaExpr == refSimhash(words))
  }
}
