package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.ops.TextOps

/** Parity of the fused filter/curation expressions with their
  * composable-builtins spellings — the builtins form is the executable
  * specification (and what the DuckDB oracles mirror); the fused form
  * is the codegen hot path. Random inputs include newlines, bullet
  * prefixes, dot runs, unicode whitespace, and astral-plane chars.
  */
class FilterExprsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    "", "a", "the a of and to", "- bullet line here\n* another\n• third",
    "ends with dots...\nplain line\nbang line!",
    "#### #hash words", "run......of dots", ".....",
    "a\nb\nc\n", "\n\n", "x y　z\nnext line.",
    "emoji 😀 line.\nsecond... ",
    "the quick brown fox jumps. over the lazy dog!")

  private val pieces = Seq(
    "the", "a", "of", "and", "to", "word", "Word7", "##", "...", ".", "!",
    "?", "- ", "* ", "• ", "\n", " ", "\t", "\u00a0", "\u2028",
    "\u2029", "\r", "\u0085", "😀", "{", "lorem ipsum", "Lorem Ipsum")
  private val textGen =
    Gen.listOf(Gen.oneOf(pieces)).map(_.mkString)

  private def randomTexts: Seq[String] =
    fixture ++ Gen.listOfN(300, textGen).sample.getOrElse(Nil)

  test("gopher_stats == builtins counters (fixture + random)") {
    val t = col("text")
    val ws = TextOps.words(t)
    val lines = split(t, "\n")
    val st = GraftFunctions.gopher_stats(t)
    val got = randomTexts.toDF("text").select(
      st.getField("n_words"), size(ws).cast("long"),
      st.getField("n_lines"), size(lines).cast("long"),
      st.getField("sum_wlen"),
      aggregate(ws, lit(0L), (a, w) => a + length(w)),
      st.getField("n_alpha"),
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long"),
      st.getField("n_stop"),
      TextOps.EnStop.map(s => when(array_contains(ws, s), 1L).otherwise(0L))
        .reduce(_ + _),
      st.getField("n_hash"), regexp_count(t, lit("#")).cast("long"),
      st.getField("n_dots"), regexp_count(t, lit("\\.\\.\\.")).cast("long"),
      st.getField("n_bullet"),
      size(filter(lines, l =>
        l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
        .cast("long"),
      st.getField("n_ell"),
      size(filter(lines, l => l.endsWith("..."))).cast("long"),
      t).collect()
    got.foreach { r =>
      (0 until 18 by 2).foreach { i =>
        assert(r.getLong(i) == r.getLong(i + 1),
          s"field $i mismatch on ${r.getString(18)}: $r")
      }
    }
  }

  // Reference spelling anchors with Java's \z (absolute end of input),
  // NOT $: Java's $ also matches BEFORE a final line terminator (\r,
  // U+0085, U+2028, U+2029 — a "line." ending in   would be kept),
  // while RE2 — the oracle's engine — anchors $ at end of text only.
  // The fused expression pins the RE2/DuckDB semantics (last char is
  // terminal punctuation), so the parity reference must spell \z.
  test("c4_stats == builtins line filter + rebuild (fixture + random)") {
    val t = col("text")
    val lines = split(t, "\n")
    val kept = filter(lines, l =>
      size(TextOps.words(l)) >= 3 && l.rlike("[.!?]\\z"))
    val st = GraftFunctions.c4_stats(t, 3)
    val got = randomTexts.toDF("text").select(
      st.getField("n_lines"), size(lines).cast("long"),
      st.getField("n_kept"), size(kept).cast("long"),
      st.getField("cleaned"), array_join(kept, "\n"), t).collect()
    def esc(s: String): String = s.map(c =>
      if (c < ' ' || c > '~') f"\\u${c.toInt}%04x" else c.toString).mkString
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"n_lines on '${esc(r.getString(6))}'")
      assert(r.getLong(2) == r.getLong(3), s"n_kept on '${esc(r.getString(6))}'")
      assert(r.getString(4) == r.getString(5),
        s"cleaned '${esc(r.getString(4))}' vs '${esc(r.getString(5))}' on '${esc(r.getString(6))}'")
    }
  }

  test("token_lines == builtins slice windows (fixture + random)") {
    val ws = TextOps.words(col("text"))
    val k = ceil(size(ws) / lit(3.0))
    val combo = when(size(ws) >= 1,
      transform(sequence(lit(0L), k - 1), i =>
        concat_ws(" ", slice(ws, (i * 3 + 1).cast("int"), lit(3)))))
      .otherwise(array().cast("array<string>"))
    val got = randomTexts.toDF("text").select(
      GraftFunctions.token_lines(col("text"), 3), combo, col("text")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"token_lines on '${r.getString(2)}'")
    }
  }

  test("suffix_lines == builtins derivation (fixture + random, non-negative doc_ids)") {
    val ws = TextOps.words(col("text"))
    val k = ceil(size(ws) / lit(4.0))
    val combo = array_join(
      transform(sequence(lit(0L), k - 1), i =>
        concat(
          concat_ws(" ", slice(ws, (i * 4 + 1).cast("int"), lit(4))),
          element_at(array(lit(""), lit("."), lit("!")),
            ((col("doc_id") + i) % 3).cast("int") + 1))),
      "\n")
    val rows = randomTexts.zipWithIndex.collect {
      // builtins sequence(0, k-1) errors on k == 0; the fused form
      // returns "" there — covered by the dedicated test below
      case (t, i) if t.trim.nonEmpty || t.exists(!_.isWhitespace) => (i.toLong, t)
    }
    val got = rows.toDF("doc_id", "text")
      .filter(size(ws) >= 1)
      .select(
        GraftFunctions.suffix_lines(col("text"), col("doc_id"), 4),
        combo, col("text")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"suffix_lines on '${r.getString(2)}'")
    }
  }

  test("suffix_lines rejects negative doc_id with a contract-naming error") {
    // the builtin spelling errors-or-nulls on negative ids (element_at
    // index 0 / DuckDB list index 0) — no engine has a meaningful
    // answer, so the fused form names the precondition loudly
    val e = intercept[Throwable] {
      Seq((-1L, "a b c d e")).toDF("doc_id", "text")
        .select(GraftFunctions.suffix_lines(col("text"), col("doc_id"), 4))
        .collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("doc_id >= 0")), s"unexpected error: $msgs")
  }

  test("suffix_lines and token_lines: empty / all-whitespace input") {
    val got = Seq((1L, ""), (2L, " \t\n ")).toDF("doc_id", "text").select(
      GraftFunctions.suffix_lines(col("text"), col("doc_id"), 4),
      GraftFunctions.token_lines(col("text"), 4)).collect()
    got.foreach { r =>
      assert(r.getString(0) == "")
      assert(r.getSeq[String](1).isEmpty)
    }
  }

  test("hashed_weight_sum == builtins md5-bucket aggregate (fixture + random)") {
    val dim = 64
    val weights = (0 until dim).map(b => ((b * 37) % 21 - 10).toLong)
    val ws = TextOps.words(col("text"))
    def tokenWeight(t: org.apache.spark.sql.Column) = {
      val h = md5(t)
      ((ascii(substring(h, 1, 1)) * 16 + ascii(substring(h, 2, 1))) % dim * 37) % 21 - 10
    }
    val combo = aggregate(ws, lit(0L), (acc, t) => acc + tokenWeight(t).cast("long"))
    val got = randomTexts.toDF("text").select(
      GraftFunctions.hashed_weight_sum(ws, weights), combo, col("text")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"wsum on '${r.getString(2)}'")
    }
  }

  test("hashed_bucket_counts == builtins md5-bucket histogram (fixture + random)") {
    val dim = 64
    val ws = TextOps.words(col("text"))
    def bucketOf(t: org.apache.spark.sql.Column) = {
      val h = md5(t)
      (ascii(substring(h, 1, 1)) * 16 + ascii(substring(h, 2, 1))) % dim
    }
    // builtins histogram: count per bucket via size(filter(...))
    val combos = (0 until dim).map(b =>
      size(filter(ws, x => bucketOf(x) === b)).cast("long"))
    val got = randomTexts.toDF("text").select(
      (GraftFunctions.hashed_bucket_counts(ws, dim) +: combos :+ col("text")): _*)
      .collect()
    got.foreach { r =>
      val fused = r.getSeq[Long](0)
      (0 until dim).foreach { b =>
        assert(fused(b) == r.getLong(1 + b),
          s"bucket $b on '${r.getString(1 + dim)}': $fused")
      }
    }
  }

  test("bucket_dot(bucket_counts(ws)) == hashed_weight_sum(ws) (fixture + random)") {
    // the r13 DSIR scoring identity: Σ_tokens w[bucket(t)] over the
    // token array equals Σ_b count_b·w_b over the per-doc bucket-count
    // array — scoring from materialized counts must be integer-exact
    val dim = 64
    val weights = (0 until dim).map(b => ((b * 31) % 17 - 8).toLong * 1000)
    val ws = TextOps.words(col("text"))
    val got = randomTexts.toDF("text").select(
      GraftFunctions.bucket_dot(
        GraftFunctions.hashed_bucket_counts(ws, dim), weights),
      GraftFunctions.hashed_weight_sum(ws, weights), col("text")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"dot on '${r.getString(2)}'")
    }
    // null input array propagates null (never 0)
    val nul = Seq(Tuple1[String](null)).toDF("text").select(
      GraftFunctions.bucket_dot(
        GraftFunctions.hashed_bucket_counts(ws, dim), weights)).collect()
    assert(nul.head.isNullAt(0))
    // a wrong-dim array fails loudly instead of truncating the product
    val e = intercept[Exception] {
      Seq(Tuple1("a b")).toDF("text").select(
        GraftFunctions.bucket_dot(
          GraftFunctions.hashed_bucket_counts(ws, 32), weights)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("graft_bucket_dot")), s"unexpected: $msgs")
  }

  test("elem_counts / key_counts: exact under cap, null past it (overflow signal)") {
    // the observe-riding model-state counters (r13): under the cap the
    // maps equal the groupBy spelling exactly; one key past the cap
    // poisons the buffer and eval returns NULL — the caller's
    // distributed-fallback signal (merge must preserve poison)
    val df = Seq(
      (1L, Seq("a b", "b c", "a b")),
      (2L, Seq("b c", "c d")),
      (3L, Seq("a b"))).toDF("doc_id", "bgs")
    val under = df.select(GraftFunctions.elem_counts(col("bgs"), 10)).collect().head
    assert(under.getMap[String, Long](0) ==
      Map("a b" -> 3L, "b c" -> 2L, "c d" -> 1L))
    val over = df.select(GraftFunctions.elem_counts(col("bgs"), 2)).collect().head
    assert(over.isNullAt(0), s"cap-2 over 3 keys must poison: $over")
    val keys = Seq(1L, 2L, 1L, 3L, 2L, 1L).toDF("k")
    val ku = keys.select(GraftFunctions.key_counts(col("k"), 5)).collect().head
    assert(ku.getMap[Long, Long](0) == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    val ko = keys.select(GraftFunctions.key_counts(col("k"), 2)).collect().head
    assert(ko.isNullAt(0))
    // null elements/keys are skipped, not counted and not poisonous
    val withNulls = Seq(Tuple1(Seq[String]("x", null, "x"))).toDF("bgs")
    assert(withNulls.select(GraftFunctions.elem_counts(col("bgs"), 10))
      .collect().head.getMap[String, Long](0) == Map("x" -> 2L))
  }

  test("token_set_counts == builtins per-set filter counts (fixture + random)") {
    val sets = Seq(Seq("the", "a", "of", "and", "to"),
      Seq("el", "una", "y", "que", "los"), Seq("..."))
    val ws = TextOps.words(col("text"))
    val cnts = GraftFunctions.token_set_counts(ws, sets)
    val combos = sets.map(s =>
      size(filter(ws, x => x.isInCollection(s))).cast("long"))
    val got = randomTexts.toDF("text").select(
      (Seq(cnts) ++ combos :+ col("text")): _*).collect()
    got.foreach { r =>
      val fused = r.getSeq[Long](0)
      sets.indices.foreach { i =>
        assert(fused(i) == r.getLong(1 + i),
          s"set $i on '${r.getString(4)}': $fused")
      }
    }
  }

  test("token_set_counts skips null elements, matching ArrayFilter semantics") {
    // the SQL-registered form is reachable with arbitrary array<string>:
    // a null token must contribute to no set (the builtins spelling's
    // isInCollection predicate is null there, and filter() excludes
    // non-true elements — it does NOT null the whole count), and only a
    // null ARRAY nulls the result
    val sets = Seq(Seq("the", "a"), Seq("word"))
    val df = Seq(1, 2).toDF("i").select(
      when(col("i") === 1, array(lit("the"), lit(null), lit("word"), lit("a")))
        .as("ws")) // i=2 -> ws is NULL
    val builtins = sets.map(s =>
      size(filter(col("ws"), x => x.isInCollection(s))).cast("long"))
    val got = df.select(
      GraftFunctions.token_set_counts(col("ws"), sets).as("fused") +: builtins: _*)
      .collect()
    assert(got(0).getSeq[Long](0) == Seq(2L, 1L), s"null element: ${got(0)}")
    sets.indices.foreach { i =>
      assert(got(0).getSeq[Long](0)(i) == got(0).getLong(1 + i),
        s"parity with builtins on set $i: ${got(0)}")
    }
    assert(got(1).isNullAt(0), "null array stays null")
  }

  test("SQL registration: the fused filter exprs callable from spark.sql") {
    GraftFunctions.registerAll(spark)
    Seq((5L, "the a of and\nword line here.")).toDF("doc_id", "text")
      .createOrReplaceTempView("graft_docs_f")
    val r = spark.sql(
      """SELECT graft_gopher_stats(text).n_words AS nw,
        |       graft_c4_stats(text, 3).n_kept AS nk,
        |       size(graft_token_lines(text, 2)) AS nl,
        |       length(graft_suffix_lines(text, doc_id, 2)) AS sl,
        |       graft_hashed_weight_sum(graft_words(text),
        |                               array(1L, 2L, 3L, 4L)) AS hw,
        |       graft_token_set_counts(graft_words(text),
        |                              array(array('the', 'a'), array('word')))[0] AS tc
        |FROM graft_docs_f""".stripMargin).collect().head
    assert(r.getLong(0) == 7L, "n_words")
    assert(r.getLong(1) == 1L, "n_kept")
    assert(r.getInt(2) == 4, "token lines")
    assert(r.getInt(3) > 0, "suffix lines")
    // every token maps to a bucket in [0, 4) -> weight in {1,2,3,4};
    // 7 tokens bound the sum
    assert(r.getLong(4) >= 7L && r.getLong(4) <= 28L, s"hw=${r.getLong(4)}")
    // "the a of and" + "word line here." -> {the, a} occurrences = 2
    assert(r.getLong(5) == 2L, s"tc=${r.getLong(5)}")
  }

  test("broadcast-probe exprs: hand values + interpreted/codegen parity") {
    // BoilerStrip / LineDigests / StrSetContains (r11): hand-checked
    // values through codegen, then the same frame through the
    // interpreted path (the NO_CODEGEN discipline below).
    import org.apache.spark.sql.GraftBridge.{column => gc, expression => ge}
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String = md.digest(
      s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val boiler = new java.util.HashSet[String]()
    boiler.add(hex("nav home")) // 2-token boiler line
    val bcSet = spark.sparkContext.broadcast(new graft.functions.StrSet(boiler))
    val strs = new java.util.HashSet[String]()
    strs.add("keep.me")
    val bcStr = spark.sparkContext.broadcast(new graft.functions.StrSet(strs))
    val df = Seq(
      (1L, "nav home alpha beta nav home", "keep.me"),
      (2L, "alpha beta", "drop.me")).toDF("doc_id", "text", "dom")
    val cols = Seq(
      gc(graft.functions.BoilerStrip(ge(col("text")), bcSet, 2)),
      gc(graft.functions.LineDigests(ge(col("text")), 2)),
      gc(graft.functions.StrSetContains(ge(col("dom")), bcStr)))
    def read(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      val st = r.getStruct(0)
      ((st.getLong(0), st.getLong(1), st.getString(2)),
        r.getSeq[String](1).toSet, r.getBoolean(2))
    }.toSeq
    val codegen = read(df.orderBy("doc_id").select(cols: _*).collect())
    // doc 1: lines [nav home][alpha beta][nav home] — the boiler line
    // counts PER INSTANCE (2), survivors rejoin in order; digests are
    // per-doc DISTINCT (2 entries, not 3)
    assert(codegen == Seq(
      ((3L, 2L, "alpha beta"), Set(hex("nav home"), hex("alpha beta")), true),
      ((1L, 0L, "alpha beta"), Set(hex("alpha beta")), false)), codegen.toString)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = read(df.orderBy("doc_id").select(cols: _*).collect())
      assert(codegen == interp, s"$codegen vs $interp")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("interpreted eval agrees with codegen for the fused filter exprs") {
    // one representative per expression through both paths
    val df = Seq((7L, "the a of\n- b c d...\nword line here.")).toDF("doc_id", "text")
    val cols = Seq(
      GraftFunctions.gopher_stats(col("text")).getField("n_words"),
      GraftFunctions.c4_stats(col("text"), 3).getField("n_kept"),
      GraftFunctions.token_lines(col("text"), 2).getItem(0),
      GraftFunctions.suffix_lines(col("text"), col("doc_id"), 2),
      GraftFunctions.hashed_weight_sum(
        TextOps.words(col("text")), (0 until 64).map(_.toLong)),
      GraftFunctions.token_set_counts(
        TextOps.words(col("text")), Seq(Seq("the", "a"))).getItem(0))
    val codegen = df.select(cols: _*).collect().head
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(cols: _*).collect().head
      assert(codegen == interp, s"$codegen vs $interp")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
