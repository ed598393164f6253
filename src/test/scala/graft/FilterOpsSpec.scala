package graft

import org.apache.spark.sql.functions._

/** Behavior pins for the rule-based filter/rewrite operators
  * (q_gopher_rules / q_c4_clean / q_boilerplate_strip /
  * q_perplexity_filter are the oracle gates; these tests pin the rule
  * paths the fixture corpus never exercises — bullet and ellipsis
  * lines, code braces, placeholder text, symbol-heavy documents,
  * fully-stripped documents).
  */
class FilterOpsSpec extends SparkSpec {

  test("gopherRules: each rule fires on its crafted violator") {
    import spark.implicits._
    val longDoc = (1 to 60).map(i => s"word$i").mkString(" ")
    val df = Seq(
      // passes everything
      (1L, longDoc + " the a of and to"),
      // too short (r_words)
      (2L, "tiny doc the a of"),
      // symbol-heavy: hash marks ≥ 10% of words (r_sym)
      (3L, longDoc + " the a " + Array.fill(10)("#").mkString(" ")),
      // bullet lines over 90% (r_bullet)
      (4L, (1 to 10).map(i => s"- bullet line $i the a").mkString("\n")),
      // ellipsis lines over 30% (r_ell)
      (5L, "one line the a...\ntwo line of and...\nplain third line"),
      // no required stopwords (r_stop)
      (6L, longDoc),
      // numeric soup: alphabetic-word ratio <= 0.8 (r_alpha)
      (7L, ((1 to 60).map(_.toString) ++ Seq("the", "a")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = GraftOps.gopherRules(df)
      .select("doc_id", "r_words", "r_wlen", "r_alpha", "r_stop", "r_sym",
        "r_bullet", "r_ell", "keep")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(8), "clean doc must keep")
    assert(!got(2L).getBoolean(1) && !got(2L).getBoolean(8), "short doc fails r_words")
    assert(!got(3L).getBoolean(5) && !got(3L).getBoolean(8), "hashy doc fails r_sym")
    assert(!got(4L).getBoolean(6), "bullet doc fails r_bullet")
    assert(!got(5L).getBoolean(7), "ellipsis doc fails r_ell")
    assert(!got(6L).getBoolean(4), "stopword-free doc fails r_stop")
    assert(!got(7L).getBoolean(3), "numeric doc fails r_alpha")
  }

  test("gopherRules: mean-word-length bounds are exact integer comparisons") {
    import spark.implicits._
    // 50 two-char words: sum_wlen = 100 < 3*50 -> r_wlen false.
    // 50 three-char words: sum_wlen = 150 = 3*50 -> boundary keeps.
    val df = Seq(
      (1L, Array.fill(50)("ab").mkString(" ")),
      (2L, Array.fill(50)("abc").mkString(" "))).toDF("doc_id", "text")
    val got = GraftOps.gopherRules(df)
      .select("doc_id", "r_wlen").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!got(1L), "2-char mean fails [3,10]")
    assert(got(2L), "exact 3.0 mean is inside the closed bound")
  }

  test("c4Clean: punctuation gate, short-line gate, brace and lorem flags") {
    import spark.implicits._
    val df = Seq(
      // kept: 4 words + '.'; dropped: no terminal punct; dropped: 2 words
      (1L, "good line stays here.\nno punct so dropped\nshort one!"),
      // doc_ok false: code brace
      (2L, "function f() { return 1; }.\nanother decent line here."),
      // doc_ok false: placeholder text (case-insensitive)
      (3L, "filler Lorem Ipsum dolor sit.\nreal content line here."),
      // nothing survives -> keep false, cleaned empty
      (4L, "all short\nno punct")).toDF("doc_id", "text")
    val got = GraftOps.c4Clean(df)
      .select("doc_id", "n_lines", "n_kept", "keep", "cleaned")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(got(1L) == ((3L, 1L, true, "good line stays here.")))
    assert(got(2L)._3 == false, "brace doc must not keep")
    assert(got(2L)._2 == 2L, "line filter still runs on brace docs")
    assert(got(3L)._3 == false, "lorem ipsum doc must not keep")
    assert(got(4L) == ((2L, 0L, false, "")))
  }

  test("boilerplateStrip: cross-doc lines removed, full strip survives, order kept") {
    import spark.implicits._
    // 4-token lines. Docs 1..3 share the SAME first line (boilerplate,
    // 3 distinct docs); each has a distinct second line. Doc 4 is ALL
    // boilerplate (both its lines shared with doc 5).
    val df = Seq(
      (1L, "nav home about contact alpha beta gamma delta"),
      (2L, "nav home about contact epsilon zeta eta theta"),
      (3L, "nav home about contact iota kappa lambda mu"),
      (4L, "footer terms privacy copy nav home about contact"),
      (5L, "footer terms privacy copy nav home about contact"))
      .toDF("doc_id", "text")
    val got = GraftOps.boilerplateStrip(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 1L, "alpha beta gamma delta")))
    assert(got(2L) == ((2L, 1L, "epsilon zeta eta theta")))
    assert(got(3L) == ((2L, 1L, "iota kappa lambda mu")))
    // fully-stripped docs stay in the output with empty cleaned text
    assert(got(4L) == ((2L, 2L, "")))
    assert(got(5L) == ((2L, 2L, "")))
  }

  test("boilerplateStrip: rebuild preserves original line order") {
    import spark.implicits._
    // doc 1: [shared, u1, shared2, u2] -> cleaned must be "u1… u2…" in
    // original positions, not sorted text order
    val df = Seq(
      (1L, "s s s s zz zz zz zz t t t t aa aa aa aa"),
      (2L, "s s s s t t t t")).toDF("doc_id", "text")
    val got = GraftOps.boilerplateStrip(df)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(1L) == "zz zz zz zz aa aa aa aa", got(1L))
    assert(got(2L) == "")
  }

  test("boilerplateStrip: literal broadcast-probe and join paths are identical") {
    // the engine self-selects by the measured frequent-set size; the
    // fused graft_boiler_strip probe must reproduce the join spelling's
    // values exactly — run on the real fixture corpus so real boiler
    // lines, partial trailing windows, and fully-stripped docs all occur
    val docs = Tables.documents(spark, sfDir)
    def rows(maxLit: Long) =
      graft.ops.FilterOps.boilerplateStrip(docs, maxLiteralBoiler = maxLit)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val lit_ = rows(graft.ops.FilterOps.MaxLiteralBoilerLines)
    val join = rows(0L)
    assert(lit_ == join)
    assert(lit_.nonEmpty && lit_.exists(_._3 > 0), "fixture must contain boiler lines")
  }

  test("firstLineDedup: keeps exactly the corpus-wide first occurrence") {
    import spark.implicits._
    // LineTok=4 windows. Duplicates across docs keep the (doc_id, pos)
    // minimum; within-doc repeats keep the earliest pos; a doc made
    // entirely of later occurrences survives with cleaned = ''.
    val df = Seq(
      (1L, "a b c d e f g h"),          // both lines first occurrences
      (2L, "a b c d x y z w"),          // line 0 dups doc 1 pos 0
      (3L, "a b c d a b c d"),          // both lines dup doc 1 pos 0
      (4L, "p q r s p q r s"))          // self-dup: pos 0 wins
      .toDF("doc_id", "text")
    val got = GraftOps.firstLineDedup(df)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 0L, "a b c d e f g h")))
    assert(got(2L) == ((2L, 1L, "x y z w")))
    assert(got(3L) == ((2L, 2L, "")), "fully-deduplicated doc survives empty")
    assert(got(4L) == ((2L, 1L, "p q r s")), "within-doc repeat keeps pos 0")
  }

  test("firstLineDedup: literal broadcast-probe and join paths are identical") {
    // the engine self-selects by the measured duplicated-line count;
    // the fused graft_first_line_strip probe must reproduce the join
    // spelling's values exactly — run on the real fixture corpus so
    // real duplicate lines, partial trailing windows, and unique-only
    // docs all occur
    val docs = Tables.documents(spark, sfDir)
    def rows(maxLit: Long) =
      graft.ops.FilterOps.firstLineDedup(docs, maxLiteralWinners = maxLit)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val lit_ = rows(graft.ops.FilterOps.MaxLiteralDupLines)
    val join = rows(0L)
    assert(lit_ == join)
    assert(lit_.nonEmpty && lit_.exists(_._3 > 0),
      "fixture must contain duplicated lines")
    // first-occurrence semantics: unlike boilerplateStrip, at least one
    // copy of every duplicated line SURVIVES somewhere in the corpus
    val totalLines = lit_.map(_._2).sum
    val totalDropped = lit_.map(_._3).sum
    assert(totalDropped < totalLines)
  }

  test("perplexityFilter: deciles partition the corpus, keep gates at the threshold") {
    import spark.implicits._
    // 20 two-word docs over a skewed bigram table: "a b" dominates, so
    // docs made of rarer bigrams score lower avg_logprob.
    val docs = ((1 to 12).map(i => (i.toLong, "a b")) ++
      (13 to 16).map(i => (i.toLong, "a c")) ++
      (17 to 20).map(i => (i.toLong, "c d"))).toDF("doc_id", "text")
    val got = GraftOps.perplexityFilter(docs)
      .select("doc_id", "avg_logprob", "decile", "keep").collect()
    val byDoc = got.map(r => r.getLong(0) ->
      ((r.getDouble(1), r.getLong(2), r.getBoolean(3)))).toMap
    // "c d" is deterministic given c (logprob ln(1)=0 ... c always
    // followed by d): highest score; "a c" is the rare continuation of
    // a: lowest. Ranking must be a-c docs < a-b docs < c-d docs.
    assert(byDoc(13L)._1 < byDoc(1L)._1 && byDoc(1L)._1 < byDoc(17L)._1)
    // deciles are monotone in score and keep == decile >= 4
    got.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) >= 4L),
        s"keep must equal decile>=4 for doc ${r.getLong(0)}")
    }
    // the 4 lowest-scoring docs (a c) occupy the bottom deciles 1-2
    assert((13 to 16).forall(i => byDoc(i.toLong)._2 <= 2))
    assert((17 to 20).forall(i => byDoc(i.toLong)._2 >= 9))
  }
}
