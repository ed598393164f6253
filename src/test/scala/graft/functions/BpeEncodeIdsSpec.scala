package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the [[BpeIdEncoder]] symbol-array splice against the published
  * boundary-padded string-replace chain (the trainer's spelling, which
  * the DuckDB oracle replays verbatim): any divergence between the
  * array scan and the string semantics — especially the
  * non-overlapping resume-after-boundary quirk on symbol runs — fails
  * here before it can hash-mismatch q_bpe_ids/q_tokenize_pack.
  */
class BpeEncodeIdsSpec extends SparkSpec {
  import spark.implicits._

  // a small trained-shape tokenizer: alphabet + merges in training order
  private val merges = Seq("a a", "aa b", "c d", "aab aab")
  private val alphabet = Seq("a", "b", "c", "d", "e", "😀")
  private val vocab: Map[String, Int] = {
    val charIds = alphabet.zipWithIndex
    val mergeIds = merges.zipWithIndex.map { case (p, k) =>
      (p.replace(" ", ""), alphabet.size + k)
    }
    (charIds ++ mergeIds).groupMapReduce(_._1)(_._2)(math.min)
  }
  private val encoder = new BpeIdEncoder(merges, vocab)

  /** The trainer's literal string spelling: char-split then splice each
    * merge with the boundary-padded replace, then split to symbols.
    */
  private def builtinsSymbols(w: Column): Column = {
    val enc0 = trim(regexp_replace(w, "(.)", "$1 "))
    val encoded = merges.foldLeft(enc0) { (acc, p) =>
      trim(replace(concat(lit(" "), acc, lit(" ")),
        lit(s" $p "), lit(" " + p.replace(" ", "") + " ")))
    }
    split(encoded, " ")
  }

  private def builtinsIds(w: Column): Column =
    transform(builtinsSymbols(w), s =>
      coalesce(element_at(typedLit(vocab), s), lit(-1)))

  private val adversarial = Seq(
    "a", "aa", "aaa", "aaaa",          // the run quirk: "a a a a" -> "aa a a"
    "aaaaa", "aaaaaa",
    "aab", "aabaab", "aabaabaab",      // chained merges incl. multi-char pair
    "ab", "ba", "abc", "cda", "cdcd",
    "e", "ede", "😀", "a😀a", "😀😀",   // alphabet chars incl. non-BMP
    "x", "axa", "xyz",                 // OOV chars -> -1
    "aacd", "cdaa", "aabcd")

  test("encoder ids == the boundary-padded replace chain on every word") {
    val got = adversarial.toDF("w")
      .select(col("w"),
        GraftFunctions.bpe_encode_ids(array(col("w")), encoder).as("mine"),
        builtinsIds(col("w")).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id mismatch on '${r.getString(0)}': ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
    }
  }

  test("multi-word arrays concatenate per-word streams; empty array -> empty ids") {
    val got = Seq(
      (Seq("aa", "b"), Seq.empty[String]),
      (Seq("aaaa", "cd", "x"), Seq("e"))
    ).toDF("ws1", "ws2")
      .select(
        GraftFunctions.bpe_encode_ids(col("ws1"), encoder).as("a"),
        GraftFunctions.bpe_encode_ids(col("ws2"), encoder).as("b"),
        flatten(transform(col("ws1"), w => builtinsIds(w))).as("ra"),
        flatten(transform(col("ws2"), w => builtinsIds(w))).as("rb"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](2))
      assert(r.getSeq[Int](1) == r.getSeq[Int](3))
    }
    assert(got(0).getSeq[Int](1).isEmpty)
  }

  test("null input propagates; interpreted == codegen") {
    val r = Seq(Option.empty[Seq[String]]).toDF("ws")
      .select(GraftFunctions.bpe_encode_ids(col("ws"), encoder)).collect().head
    assert(r.isNullAt(0))
    val df = adversarial.toDF("w")
    val c = GraftFunctions.bpe_encode_ids(array(col("w")), encoder)
    val codegen = df.select(c).collect().map(_.getSeq[Int](0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(c).collect().map(_.getSeq[Int](0)).toSeq
      assert(codegen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("fixture words: encoder == replace chain under the real trained tokenizer") {
    val docs = graft.Tables.documents(spark, sfDir)
    val tok = graft.ops.TrainPrepOps.bpeTokenizer(
      docs, graft.ops.TrainPrepOps.TokRounds)
    def realBuiltins(w: Column): Column = {
      val enc0 = trim(regexp_replace(w, "(.)", "$1 "))
      val encoded = tok.merges.foldLeft(enc0) { (acc, p) =>
        trim(replace(concat(lit(" "), acc, lit(" ")),
          lit(s" $p "), lit(" " + p.replace(" ", "") + " ")))
      }
      transform(split(encoded, " "), s =>
        coalesce(element_at(typedLit(tok.vocabIds), s), lit(-1)))
    }
    val got = docs.limit(64)
      .select(explode(graft.ops.TextOps.words(col("text"))).as("w"))
      .select(col("w"),
        GraftFunctions.bpe_encode_ids(array(col("w")), tok.encoder).as("mine"),
        realBuiltins(col("w")).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"mismatch on '${r.getString(0)}'")
    }
    // every id resolves (no -1): the alphabet covers the training corpus
    assert(got.forall(_.getSeq[Int](1).forall(_ >= 0)))
  }
}
