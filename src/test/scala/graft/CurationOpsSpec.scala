package graft

import org.apache.spark.sql.functions._

/** Behavior pins for the curation operators (q_pii_scrub /
  * q_line_dedup / q_url_extract / q_quality_classifier are the oracle
  * gates; these tests pin the operator semantics on crafted inputs the
  * fixture can't produce — overlapping PII, all-duplicate documents,
  * URL edge shapes).
  */
class CurationOpsSpec extends SparkSpec {

  test("piiScrub counts and redacts each category independently") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b-c_9@sub.example.org and 10.0.255.7 then 555-0199 end"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.co one ip 1.2.3.4")).toDF("doc_id", "text")
    val got = GraftOps.piiScrub(df)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "scrubbed")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(got(1L) == ((1, 1, 1, "mail [EMAIL] and [IP] then [PHONE] end")))
    assert(got(2L) == ((0, 0, 0, "no pii here at all")))
    assert(got(3L) == ((2, 1, 0, "two mails [EMAIL] [EMAIL] one ip [IP]")))
  }

  test("piiScrub redaction order: emails win over their embedded dots/digits") {
    import spark.implicits._
    // the email's host "10.1.2.3.example.com" contains an IPv4-looking
    // run; email redaction must consume the WHOLE address first, so no
    // [IP] marker appears inside [EMAIL]
    val df = Seq((1L, "x user@10.1.2.3.example.com y")).toDF("doc_id", "text")
    val r = GraftOps.piiScrub(df).select("n_emails", "scrubbed").head
    assert(r.getInt(0) == 1)
    assert(r.getString(1) == "x [EMAIL] y", r.getString(1))
  }

  test("lineDupStats: all-duplicate doc dropped, unique doc kept, counts exact") {
    import spark.implicits._
    // docs 1 and 2 are identical 6-token texts -> every 3-token line of
    // each occurs twice corpus-wide -> dup_frac 1.0, keep = false.
    // doc 3 shares no line -> dup_frac 0.0, keep = true.
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "g h i j k l")).toDF("doc_id", "text")
    val got = GraftOps.lineDupStats(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((2L, 2L, 1.0, false)))
    assert(got(2L) == ((2L, 2L, 1.0, false)))
    assert(got(3L) == ((2L, 0L, 0.0, true)))
  }

  test("lineDupStats: a line duplicated WITHIN one document counts as duplicate") {
    import spark.implicits._
    val df = Seq((1L, "x y z x y z q r s")).toDF("doc_id", "text")
    val r = GraftOps.lineDupStats(df).head
    // lines: "x y z", "x y z", "q r s" -> 2 of 3 duplicated
    assert((r.getLong(1), r.getLong(2), r.getBoolean(4)) == ((3L, 2L, false)))
  }

  test("lineDupStats: ragged tail line shorter than lineTokens still participates") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "d")).toDF("doc_id", "text")
    // doc 1 lines: "a b c", "d"; doc 2 line: "d" -> "d" is duplicated
    val got = GraftOps.lineDupStats(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((1L, 1L)))
  }

  test("urlDomains cuts hosts and counts docs distinctly") {
    import spark.implicits._
    val df = Seq(
      (1L, "see https://a.example.com/x/y and http://b.net/z"),
      (2L, "again https://a.example.com/other plus https://a.example.com/more")).toDF("doc_id", "text")
    val got = GraftOps.urlDomains(df)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "a.example.com" -> ((3L, 2L)),
      "b.net" -> ((1L, 1L))))
  }

  test("dsirWeights: target-exclusive tokens score high, raw-only score zero") {
    import spark.implicits._
    // "a" (bucket 35) appears only in the target source, "b" (bucket 2)
    // only outside it; with Nr=4, Nt=2: rint(a)=2*4*1000/(2*2)=2000,
    // rint(b)=0 — so the target doc averages ratio 2.0 and is kept, the
    // raw doc averages 0.0 and is dropped.
    val df = Seq(
      (1L, "tgt", "a a"),
      (2L, "web", "b b")).toDF("doc_id", "source", "text")
    val got = GraftOps.dsirWeights(df, Seq("tgt"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((2L, 4000L, 2.0, true)))
    assert(got(2L) == ((2L, 0L, 0.0, false)))
  }

  test("dsirWeights: a raw-source doc made of target-like tokens is kept") {
    import spark.implicits._
    // DSIR selects by CONTENT, not by source label: doc 3 lives in the
    // raw source but speaks the target vocabulary, so it must be kept.
    val df = Seq(
      (1L, "tgt", "alpha beta alpha"),
      (2L, "web", "gamma delta gamma delta"),
      (3L, "web", "alpha beta")).toDF("doc_id", "source", "text")
    val got = GraftOps.dsirWeights(df, Seq("tgt"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got(1L) && got(3L) && !got(2L), got.toString)
  }

  test("dsirWeights treats a null source as non-target (no NPE)") {
    import spark.implicits._
    // r10 regression: isInCollection propagates a null source to a null
    // is_tgt GROUP, and the collected-row getBoolean threw NPE. Null
    // sources must count toward the raw corpus, exactly like the old
    // when(...).otherwise(0) spelling.
    val df = Seq(
      (1L, Some("tgt"), "a a"),
      (2L, Some("web"), "b b"),
      (3L, Option.empty[String], "b b")).toDF("doc_id", "source", "text")
    val got = GraftOps.dsirWeights(df, Seq("tgt"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // "a" is target-exclusive (kept); "b" appears only in non-target
    // rows — including the null-source row — so both "b" docs drop
    assert(got == Map(1L -> true, 2L -> false, 3L -> false), got.toString)
  }

  test("dsirWeights rejects an empty target and a target with no tokens") {
    import spark.implicits._
    val df = Seq((1L, "web", "x y")).toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      GraftOps.dsirWeights(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      GraftOps.dsirWeights(df, Seq("nosuch"))
    }
  }

  test("hashedQuality is deterministic, bounded, and label == prob > 0.5") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark table join merge window"),
      (2L, "the a of and to")).toDF("doc_id", "text")
    val rows = GraftOps.hashedQuality(df).collect()
    val again = GraftOps.hashedQuality(df).collect()
    assert(rows.toSeq == again.toSeq, "not deterministic")
    rows.foreach { r =>
      val (n, wsum, score, prob, label) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))
      assert(math.abs(wsum) <= 10 * n, "per-token weight bound violated")
      assert(score >= -1.0 && score <= 1.0)
      assert(prob > 0.0 && prob < 1.0)
      assert(label == (prob > 0.5))
    }
  }

  test("fused PII pass matches the builtins regex chain") {
    import spark.implicits._
    // crafted rows covering every pattern, overlaps, repeats, and misses
    val texts = Seq(
      "a@b.co and c.d-e@f.g.hh twice a@b.co",
      "ip 1.2.3.4 then 255.255.255.255 and phone 555-1234",
      "overlap a@1.2.3.4.com near 999-0000 123-4567",
      "nothing to see here",
      "edge .@. 1.2.3 555-123 12.34.56.789.00")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = ops.CurationOps.piiScrub(df)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "scrubbed")
      .orderBy("doc_id").collect().toSeq
    val t = col("text")
    val builtins = df
      .withColumn("n_emails", regexp_count(t, lit(ops.CurationOps.EmailRe)))
      .withColumn("n_ips", regexp_count(t, lit(ops.CurationOps.Ipv4Re)))
      .withColumn("n_phones", regexp_count(t, lit(ops.CurationOps.PhoneRe)))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, ops.CurationOps.EmailRe, "[EMAIL]"),
            ops.CurationOps.Ipv4Re, "[IP]"),
          ops.CurationOps.PhoneRe, "[PHONE]"))
      .select("doc_id", "n_emails", "n_ips", "n_phones", "scrubbed")
      .orderBy("doc_id").collect().toSeq
    assert(fused == builtins)
    assert(fused.exists(_.getInt(1) > 0) && fused.exists(_.getInt(2) > 0))
  }

  test("urlBlocklistGate: dot-suffix subdomain match, no bare-suffix false positive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://spam.example/a"),          // exact registered domain
      (2L, "https://cdn.spam.example/a"),      // subdomain of blocked
      (3L, "https://notspam.example/a"),       // bare-suffix trap: NOT blocked
      (4L, "https://ok.example/tracker/x"),    // path rule
      (5L, "https://spam.example/tracker/x"),  // domain rule wins over path
      (6L, "https://ok.example/page/1"),
      (7L, "https://spam.example:443/a"),       // default port must not bypass
      (8L, "https://user@spam.example/a"),      // userinfo must not bypass
      (9L, "HTTPS://SPAM.EXAMPLE/a"),           // case must not bypass
      (10L, "https://ok.example/p?next=/tracker/x"), // query string: NOT the path
      (11L, "https://spam.example?x=1"),          // path-less + query must not bypass
      (12L, "https://spam.example#frag"),         // path-less + fragment must not bypass
      (13L, "https://ok.example?x=1")             // path-less kept URL stays kept
    ).toDF("doc_id", "url")
    val got = ops.CurationOps
      .urlBlocklistGate(docs, "url", Seq("spam.example"), "/tracker/")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(
      1L -> "blocked_domain", 2L -> "blocked_domain", 3L -> "kept",
      4L -> "blocked_path", 5L -> "blocked_domain", 6L -> "kept",
      7L -> "blocked_domain", 8L -> "blocked_domain", 9L -> "blocked_domain",
      10L -> "kept", 11L -> "blocked_domain", 12L -> "blocked_domain",
      13L -> "kept"))
  }

  test("urlBlocklistGate rejects bare-TLD and degenerate blocklist entries") {
    import spark.implicits._
    val docs = Seq((1L, "https://a.example/x")).toDF("doc_id", "url")
    for (bad <- Seq("com", ".", ".spam.example", "spam.example.", "a..b"))
      intercept[IllegalArgumentException] {
        ops.CurationOps.urlBlocklistGate(docs, "url", Seq(bad), "/tracker/")
      }
    // registrable entries still pass validation
    ops.CurationOps.urlBlocklistGate(docs, "url",
      Seq("spam.example", "ads.co.uk"), "/tracker/")
  }

  test("normalizeText: every rule fires, and the pass is idempotent") {
    import spark.implicits._
    val dirty = "a\u00A0‘b’\u0007 “c” d–e—f…  g "
    val df = Seq((1L, dirty)).toDF("doc_id", "t")
      .select(ops.CurationOps.normalizeText(col("t")).as("n"))
    val once = df.collect().head.getString(0)
    assert(once == "a 'b' \"c\" d-e-f... g")
    val twice = Seq((1L, once)).toDF("doc_id", "t")
      .select(ops.CurationOps.normalizeText(col("t")).as("n"))
      .collect().head.getString(0)
    assert(twice == once, "normalization must be idempotent")
  }

  test("normalizeText is idempotent on random mixed-alphabet strings") {
    import spark.implicits._
    // fixed-seed fuzz over an alphabet biased toward the characters the
    // rules touch (typographic pairs, controls, whitespace runs) — the
    // one-string rule spec above can't cover rule interactions
    val alphabet = "ab c\u2018\u2019\u201C\u201D\u2013\u2014\u2026\u00A0\u0007\t\n .x".toVector
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(300) {
      Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size))).mkString
    }
    val df = strs.toDF("t")
      .select(ops.CurationOps.normalizeText(col("t")).as("n1"))
      .select(col("n1"), ops.CurationOps.normalizeText(col("n1")).as("n2"))
    val broken = df.filter(col("n1") =!= col("n2")).collect()
    assert(broken.isEmpty, broken.take(3).mkString("; "))
  }

  test("corpusDiff: all four statuses on crafted snapshots, formatting churn is not a change") {
    import spark.implicits._
    val v1 = Seq(
      (1L, "s", "kept as is"),
      (2L, "s", "will change"),
      (3L, "s", "gets  SPACED   out"), // only whitespace/case churn in v2
      (4L, "s", "will be removed")).toDF("doc_id", "source", "text")
    val v2 = Seq(
      (1L, "s", "kept as is"),
      (2L, "s", "has changed"),
      (3L, "s", "GETS spaced OUT"),
      (5L, "s", "newly added doc")).toDF("doc_id", "source", "text")
    val r = ops.CurationOps.corpusDiff(v1, v2).collect().head
    // doc 3's fingerprint ignores whitespace runs and case -> SAME
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((1L, 1L, 1L, 2L)), r.toString) // added, removed, changed, same
    // token delta: v2 totals (3+2+3+3=11) minus v1 totals (3+2+3+3=11)
    assert(r.getLong(5) == 0L, r.toString)
  }

  test("urlBlocklistGate rejects blocklist entries with scheme or path") {
    import spark.implicits._
    val docs = Seq((1L, "https://a.example/x")).toDF("doc_id", "url")
    intercept[IllegalArgumentException] {
      ops.CurationOps.urlBlocklistGate(docs, "url",
        Seq("https://spam.example"), "/tracker/")
    }
  }

  test("perceptronQuality learns a separable weak-label split to 100% accuracy") {
    import spark.implicits._
    // The fixture corpus carries no real source signal (the LangIdSpec
    // precedent) — the learning claim is demonstrated here on docs
    // whose vocabularies genuinely separate: curated docs repeat one
    // word family, crawl docs another, with counts dominating any
    // 64-bucket hash collisions.
    val docs = (
      (1 to 10).map(i => (i.toLong, "curated",
        "alpha alpha beta beta gamma gamma alpha beta")) ++
      (11 to 20).map(i => (i.toLong, "crawl",
        "delta delta epsilon epsilon zeta zeta delta epsilon")))
      .toDF("doc_id", "source", "text")
    val got = GraftOps.perceptronQuality(docs, Seq("curated"))
      .collect()
    assert(got.length == 20)
    assert(got.forall(_.getBoolean(5)), // correct
      "all docs must classify correctly on a separable split")
    // positives score strictly positive, negatives at or below zero
    got.foreach { r =>
      if (r.getLong(1) == 1L) assert(r.getLong(3) > 0L)
      else assert(r.getLong(3) <= 0L)
    }
  }

  test("perceptronQuality round-1 weights are exactly the target bucket histogram") {
    import spark.implicits._
    // With w(0)=0 every round-1 prediction is 0, so the round-1 update
    // is Σ_{y=1} c_ib — scoring a NEGATIVE doc with disjoint vocabulary
    // under 1-round training must give 0 (no shared buckets), and a
    // POSITIVE doc scores its own squared-ish count dot — pinned on a
    // collision-free pair.
    val docs = Seq(
      (1L, "curated", "alpha alpha alpha"),
      (2L, "crawl", "omega")).toDF("doc_id", "source", "text")
    val got = GraftOps.perceptronQuality(docs, Seq("curated"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == 9L, s"3 tokens x weight 3 in one bucket: ${got(1L)}")
    assert(got(2L) == 0L || got(2L) == 3L,
      "disjoint word scores 0 unless it hash-collides with alpha")
  }
}
