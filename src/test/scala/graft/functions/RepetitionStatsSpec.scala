package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Parity of the native fused repetition counters with the built-ins
  * spelling (`array_max(transform(array_distinct(ws), w ->
  * size(filter(ws, _ === w))))` etc.) — the built-ins form is the
  * executable specification; the native hash-pass is the O(n) hot path
  * `q_repetition_signals` runs.
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    "a", "a a", "a b", "a b a b", "a a a a", "x y z x y x",
    "the the the quick quick fox", "二 二 词",
    "one two three four five six seven eight nine ten",
    "aa aa aaa aa b b b b b b c")

  private val tokenGen = Gen.oneOf("a", "b", "c", "aa", "bb", "二", "xyz")
  private val textGen =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString(" "))

  test("native repetition counters == built-ins spelling (fixture + random)") {
    val texts = fixture ++ Gen.listOfN(150, textGen).sample.getOrElse(Nil)
    val df = texts.toDF("text")
      .select(GraftFunctions.words(col("text")).as("ws"))
      .select(col("ws"),
        GraftFunctions.repetition_stats(col("ws")).as("st"),
        graft.ops.TextOps.shingles(
          concat_ws(" ", col("ws")), 2).as("bg"))
      .select(
        col("st.n_tokens"), col("st.max_unigram"),
        col("st.distinct_bigrams"), col("st.n_bigrams"), col("st.sum_word_len"),
        size(col("ws")).cast("long").as("e_n"),
        array_max(transform(array_distinct(col("ws")),
          w => size(filter(col("ws"), x => x === w)))).cast("long").as("e_max"),
        size(array_distinct(col("bg"))).cast("long").as("e_db"),
        greatest(size(col("ws")) - 1, lit(0)).cast("long").as("e_nb"),
        aggregate(transform(col("ws"), x => length(x).cast("long")), lit(0L),
          (acc, x) => acc + x).as("e_sum"))
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(5), s"n_tokens: $r")
      assert(r.getLong(1) == r.getLong(6), s"max_unigram: $r")
      assert(r.getLong(2) == r.getLong(7), s"distinct_bigrams: $r")
      assert(r.getLong(3) == r.getLong(8), s"n_bigrams: $r")
      assert(r.getLong(4) == r.getLong(9), s"sum_word_len: $r")
    }
  }

  test("empty token array yields all-zero counters") {
    val r = Seq("").toDF("text")
      .select(GraftFunctions.repetition_stats(
        GraftFunctions.words(col("text"))).as("st"))
      .select(col("st.*")).head
    assert((0 until 5).map(r.getLong) == Seq(0L, 0L, 0L, 0L, 0L))
  }
}
