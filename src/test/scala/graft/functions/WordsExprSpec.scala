package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.ops.TextOps

/** Parity of the native tokenizer/shingler with the built-ins spelling
  * (`filter(split(text, WsRe), _ =!= "")` and the element_at n-gram
  * transform) — the built-ins form is the executable specification; the
  * native form is the plan-robust hot path.
  */
class WordsExprSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    "", "a", " a  b\t c\n", "a\u00a0b", "\u591a \u8bcd \u8ba1\u6570",
    "the quick brown fox", "   ", "one", "x y\u3000z",
    "\u0085line\u2028sep\u2009narrow\u205fmath\u3000cjk",
    "emoji \ud83d\ude00 pair \ud83d\ude00\ud83d\ude00 end")

  // Go-space chars + word chars incl. an astral-plane surrogate pair.
  // Space chars are built from codepoints: U+2028/U+2029 as source
  // literals would be eaten by the Scala lexer (line separators), and
  // several of the others are invisible.
  private val wordChars = Seq("a", "b", "Z", "7", ".", "\u4e8c", "\ud83d\ude00")
  private val spaceChars = Seq(
    0x09, 0x0a, 0x0b, 0x0c, 0x0d, 0x20, 0x85, 0xa0, 0x1680,
    0x2000, 0x2005, 0x200a, 0x2028, 0x2029, 0x202f, 0x205f, 0x3000)
    .map(cp => new String(Character.toChars(cp)))
  private val textGen =
    Gen.listOf(Gen.frequency(6 -> Gen.oneOf(wordChars), 4 -> Gen.oneOf(spaceChars)))
      .map(_.mkString)

  private def randomTexts: Seq[String] =
    fixture ++ Gen.listOfN(200, textGen).sample.getOrElse(Nil)

  test("native words == built-ins words (fixture + random unicode)") {
    val got = randomTexts.toDF("text").select(
      TextOps.words(col("text")).as("native"),
      TextOps.wordsBuiltins(col("text")).as("combo")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  test("native shingles == element_at transform spelling (n=2 and n=3)") {
    def combo(n: Int) = {
      val ws = TextOps.wordsBuiltins(col("text"))
      // sequence(1, 0) counts DOWN, so guard the short-input case instead
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)), i =>
          concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    }
    for (n <- Seq(2, 3)) {
      val got = randomTexts.toDF("text").select(
        TextOps.shingles(col("text"), n).as("native"),
        combo(n).as("combo")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n ${r.toString}")
      }
    }
  }

  test("fewer than n tokens -> empty array; null in -> null out") {
    val rows = Seq(Some("one two"), Some("one"), Some(""), None).toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("sh"),
        TextOps.words(col("text")).as("ws"))
      .collect()
    assert(rows(0).getSeq[String](0).isEmpty && rows(0).getSeq[String](1).size == 2)
    assert(rows(1).getSeq[String](0).isEmpty)
    assert(rows(2).getSeq[String](0).isEmpty && rows(2).getSeq[String](1).isEmpty)
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(1))
  }

  test("participates in whole-stage codegen (no fallback)") {
    val df = graft.Tables.documents(spark, sfDir)
      .select(TextOps.words(col("text")).as("ws"),
        TextOps.shingles(col("text"), 3).as("sh"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_words"), s"no codegen span in:\n$plan")
    assert(df.count() > 0)
  }

  test("SQL registration: graft_words / graft_shingles callable from spark.sql") {
    GraftFunctions.registerAll(spark)
    graft.Tables.documents(spark, sfDir).createOrReplaceTempView("graft_docs_w")
    val r = spark.sql(
      """SELECT size(graft_words(text)) AS nw, size(graft_shingles(text, 3)) AS ns
        |FROM graft_docs_w WHERE doc_id = 0""".stripMargin).collect().head
    assert(r.getInt(0) >= 3 && r.getInt(1) == r.getInt(0) - 2)
  }
}
