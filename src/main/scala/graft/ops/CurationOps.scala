package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

import Present._

/** Corpus-curation operators a production training-data pipeline runs
  * between raw crawl and tokenizer: PII detection/redaction, paragraph
  * (line-level) deduplication, URL canonicalization, and hashed-feature
  * linear-model quality scoring (the fastText-classifier shape behind
  * CCNet/RedPajama-style quality filters).
  *
  * The fixture corpus is a clean word soup (no emails/IPs/URLs — see
  * TESTDATA.md), so the PII and URL queries derive their dirty column
  * IN-PLAN from (doc_id, source, lang, n_chars) — the same
  * deterministic-derivation pattern the OCR queries use to render
  * images — and BOTH engines derive it with the identical expression,
  * so the oracle checks the operator (regex detect/redact/extract),
  * not the synthesis.
  *
  * Regex dialect parity (the [[TextOps.WsRe]] discipline): every
  * pattern here restricts itself to the Java-regex ∩ RE2 common
  * subset — explicit character classes, `\d`, `\b`, bounded
  * repetition — so engine and oracle match identically on ANY input,
  * not just the fixture.
  *
  * Scale shapes, in order: PII scrub / URL extract / quality scoring
  * are fully narrow per-document passes (the only exchanges are the
  * final presentation aggregations); line dedup is the one genuinely
  * corpus-global operator — its exchange carries 16-byte md5 digests
  * (the q_repeated_spans lesson, PipelineOps.scala:339), never line
  * text.
  */
object CurationOps extends QueryModule {
  import TextOps.{WordsSql, words}

  // ------------------------------------------------------------------
  // PII detection + redaction
  // ------------------------------------------------------------------

  /** Java-regex ∩ RE2 spellings; `\b`/`\d` are ASCII in both. */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhoneRe = """\b\d{3}-\d{4}\b"""

  /** Adds per-row PII counts and a scrubbed copy of `textCol`:
    * `n_emails`/`n_ips`/`n_phones` (match counts on the ORIGINAL text,
    * so overlapping categories each see the raw string) and `scrubbed`
    * (emails → `[EMAIL]`, then IPv4 → `[IP]`, then phones → `[PHONE]`,
    * in that fixed order on both engines). Fully narrow, and all four
    * outputs come from ONE fused codegen pass
    * ([[graft.functions.PiiStats]] — the builtins chain evaluated six
    * regex expressions per row, each with its own string conversion;
    * builtin parity is spec'd in CurationOpsSpec); codegen
    * subexpression elimination dedups the struct-field reads.
    */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val st = org.apache.spark.sql.GraftBridge.column(
      graft.functions.PiiStats(
        org.apache.spark.sql.GraftBridge.expression(col(textCol))))
    // the struct lands in its OWN projection and the four field reads
    // in the next: CollapseProject keeps the split (a non-cheap
    // expression referenced four times is not inlined), so the battery
    // runs once per row even where codegen-level subexpression
    // elimination would not reach (e.g. into partial aggregates)
    df.withColumn("__graft_pii_st", st)
      .withColumn("n_emails", col("__graft_pii_st.n_emails"))
      .withColumn("n_ips", col("__graft_pii_st.n_ips"))
      .withColumn("n_phones", col("__graft_pii_st.n_phones"))
      .withColumn("scrubbed", col("__graft_pii_st.scrubbed"))
      .drop("__graft_pii_st")
  }

  /** The shared dirty-text derivation: one email, one IPv4, one phone
    * per document, all deterministic in (doc_id, source, n_chars).
    */
  private def piiText: Column = concat(
    col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@"), col("source"), lit(".org"),
    lit(" ip 10."), (col("doc_id") % 256).cast("string"),
    lit("."), (col("n_chars") % 256).cast("string"), lit(".7"),
    lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))

  // Single line: a multi-line constant interpolated into the outer
  // query's stripMargin would lose the leading `|` of a `||` concat.
  private val PiiTextSql =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source || '.org'" +
      " || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(n_chars % 256 AS VARCHAR) || '.7'" +
      " || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"

  // ------------------------------------------------------------------
  // Typographic / control-character normalization (the ftfy-lite pass)
  // ------------------------------------------------------------------

  /** Character-level cleanup every web corpus runs before
    * fingerprinting/dedup (typographic variants of the same sentence
    * must collapse to one fingerprint): curly quotes → straight,
    * en/em-dash → hyphen, ellipsis → "...", NBSP → space, control
    * characters stripped, whitespace runs collapsed, ends trimmed.
    * The pair list drives BOTH dialects, so the engines can't drift.
    */
  val NormalizePairs: Seq[(String, String)] = Seq(
    "‘" -> "'", "’" -> "'", "“" -> "\"", "”" -> "\"",
    "–" -> "-", "—" -> "-", "…" -> "...", " " -> " ")

  /** Control characters except \t\n\r (which are whitespace and fold
    * into the \s+ collapse); Java and RE2 read the class identically.
    */
  val CtrlRe = """[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"""

  /** One narrow codegen pass; stream-applicable as-is. */
  def normalizeText(c: Column): Column = {
    val replaced = NormalizePairs.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
    trim(regexp_replace(regexp_replace(replaced, CtrlRe, ""), "\\s+", " "))
  }

  /** The DuckDB spelling of [[normalizeText]], generated from the SAME
    * pair list. `inner` is a SQL expression for the raw text.
    */
  def normalizeTextSql(inner: String): String = {
    val replaced = NormalizePairs.foldLeft(inner) { case (acc, (from, to)) =>
      s"replace($acc, '$from', '${to.replace("'", "''")}')"
    }
    s"trim(regexp_replace(regexp_replace($replaced, '$CtrlRe', '', 'g'), '\\s+', ' ', 'g'))"
  }

  // ------------------------------------------------------------------
  // Paragraph (line-level) dedup — the CCNet/Dolma curation stage
  // ------------------------------------------------------------------

  /** Per-document duplicated-line statistics: documents are segmented
    * into consecutive `lineTokens`-token lines (the fixture has no
    * newlines, so token windows stand in for paragraphs; a newline
    * corpus would `split(text, '\n')` instead); a line is duplicated
    * when its md5 occurs more than once ANYWHERE in the corpus.
    * Output: (doc_id, n_lines, n_dup_lines, dup_frac, keep) with
    * `keep = dup_frac <= maxDupFrac` — the drop rule CCNet applies to
    * boilerplate-dominated pages.
    *
    * Scale: one exchange keyed by the 16-byte digest (line text never
    * shuffles — the window reads it only pre-exchange), then one
    * doc_id-keyed aggregation. The digest window is high-cardinality
    * by construction (lines), never a low-cardinality window key.
    */
  def lineDupStats(
      docs: DataFrame, lineTokens: Int = 3,
      maxDupFrac: Double = 0.5): DataFrame = {
    // line segmentation via the fused TokenLines codegen pass (the
    // transform/slice lambda chain this replaces ran interpreted)
    val lines = docs
      .filter(TextOps.wordCount(col("text")) >= 1)
      .select(
        col("doc_id"),
        explode(graft.functions.GraftFunctions.token_lines(
          col("text"), lineTokens)).as("line"))
    val cnt = count(lit(1)).over(Window.partitionBy(unhex(md5(col("line")))))
    val dup = sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_lines")
    lines
      .select(col("doc_id"), cnt.as("cnt"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        dup,
        Exact.round6(
          sum(when(col("cnt") > 1, 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("dup_frac"),
        (sum(when(col("cnt") > 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)) <= maxDupFrac).as("keep"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // URL extraction + domain canonicalization
  // ------------------------------------------------------------------

  val UrlRe = """https?://[A-Za-z0-9._/-]+"""
  val DomainRe = """https?://([^/]+)"""

  /** Per-domain URL frequency over `textCol`: extract every URL, cut
    * its host, aggregate. The domain-frequency table every crawl
    * pipeline builds for allowlist/blocklist decisions. Narrow explode
    * + one domain-keyed aggregation (domains are the LOW-cardinality
    * side — the aggregate, not a window).
    */
  def urlDomains(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
        explode(regexp_extract_all(col(textCol), lit(UrlRe), lit(0))).as("url"))
      .select(col("doc_id"),
        regexp_extract(col("url"), DomainRe, 1).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("domain")

  /** URL blocklist gate — the other half of the crawl-curation URL
    * story ([[urlDomains]] builds the frequency table; this applies the
    * decision): a doc is dropped when its URL's host matches a blocked
    * registered domain (exact host OR any subdomain via dot-suffix
    * match — blocking `spam.example` must catch `cdn.spam.example`) or
    * its path contains a blocked segment (tracker/ad endpoints).
    * Domain rule wins when both hit. The blocklist rides into the plan
    * as a literal array (broadcast by construction — real blocklists
    * are ~1e5 entries, far under any broadcast threshold); the whole
    * gate is one narrow codegen pass, stream-applicable as-is.
    */
  def urlBlocklistGate(df: DataFrame, urlCol: String,
      blockedDomains: Seq[String], blockedPathSeg: String): DataFrame = {
    require(blockedDomains.forall(_.matches("[a-z0-9.-]+")),
      "blocked domains must be bare lowercase hosts (no scheme/path/port)")
    // A bare public suffix ('com') or a degenerate entry ('.', leading/
    // trailing dot) turns the dot-suffix rule into "block every .com
    // host" — that is a caller mistake, not intent: a registrable
    // domain always has an interior dot.
    val degenerate = blockedDomains.filter(b =>
      !b.matches("""[a-z0-9][a-z0-9-]*(\.[a-z0-9][a-z0-9-]*)+"""))
    require(degenerate.isEmpty,
      s"blocked domains must be registrable (label.tld — interior dot, no " +
        s"leading/trailing/empty labels); got: ${degenerate.mkString(", ")}")
    // Canonicalize before matching — a gate bypassable by 'HTTPS://',
    // a ':443' default port, or 'user@' userinfo is not a gate:
    // case-insensitive scheme, strip userinfo (to the LAST @) and any
    // :port, lowercase the host. The path rule reads only the PATH
    // (query strings excluded — '?next=/tracker/x' must not over-block).
    val rawHost = regexp_extract(col(urlCol), GateHostRe, 1)
    val host = lower(regexp_replace(
      regexp_replace(rawHost, "^.*@", ""), ":[0-9]+$", ""))
    val path = regexp_extract(col(urlCol), GatePathRe, 1)
    val bl = typedLit(blockedDomains)
    val domainHit =
      exists(bl, b => host === b || endswith(host, concat(lit("."), b)))
    val pathHit = path.contains(blockedPathSeg)
    df.withColumn("status",
      when(domainHit, "blocked_domain")
        .when(pathHit, "blocked_path")
        .otherwise("kept"))
  }

  /** Gate-side URL anatomy (shared by both dialects — Java and RE2 read
    * these identically): case-insensitive scheme; the HOST stops at the
    * first of `/`, `?`, or `#` — a path-less URL like
    * `https://spam.example?x=1` or `https://spam.example#f` ends its
    * authority at the `?`/`#`, and a host regex that only stops at `/`
    * would capture the query/fragment into the host and let a blocked
    * domain through (spec'd in CurationSpec); path stops at ?/#.
    */
  val GateHostRe = """(?i)https?://([^/?#]+)"""
  val GatePathRe = """(?i)https?://[^/]+(/[^?#]*)"""

  // ------------------------------------------------------------------
  // Corpus snapshot diff — the dataset-versioning audit
  // ------------------------------------------------------------------

  /** What changed between corpus v1 and v2 — the audit every dataset
    * release note needs: per source, how many docs were added, removed,
    * changed (same doc_id, different content FINGERPRINT — whitespace-
    * normalized, so formatting churn doesn't count as a change), or
    * kept byte-identical, plus the net token delta. ONE full-outer join
    * keyed by doc_id (both sides pre-projected to ~50-byte rows:
    * fingerprints and counts shuffle, text never does).
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    // tokenize ONCE per row (the engine's hottest inner loop) and derive
    // both the fingerprint and the token count from the same array —
    // fingerprint(text) + wordCount(text) would be two full text passes
    def sideRows(v: DataFrame, tag: String) = v
      .select(col("doc_id"), col("source"), words(col("text")).as("ws"))
      .select(
        col("doc_id"), col("source").as(s"src_$tag"),
        md5(lower(concat_ws(" ", col("ws")))).as(s"fp_$tag"),
        size(col("ws")).cast("long").as(s"tk_$tag"))
    sideRows(v1, "a").join(sideRows(v2, "b"), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src_b"), col("src_a")).as("source"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") === col("fp_b"), "same")
          .otherwise("changed").as("status"),
        (coalesce(col("tk_b"), lit(0L)) - coalesce(col("tk_a"), lit(0L)))
          .as("dtk"))
      .groupBy("source")
      .agg(
        sum(when(col("status") === "added", 1).otherwise(0))
          .cast("long").as("n_added"),
        sum(when(col("status") === "removed", 1).otherwise(0))
          .cast("long").as("n_removed"),
        sum(when(col("status") === "changed", 1).otherwise(0))
          .cast("long").as("n_changed"),
        sum(when(col("status") === "same", 1).otherwise(0))
          .cast("long").as("n_same"),
        sum(col("dtk")).cast("long").as("token_delta"))
      .boundedSort("source")
  }

  // ------------------------------------------------------------------
  // Hashed-feature linear quality classifier (fastText shape)
  // ------------------------------------------------------------------

  /** Feature hashing dimension and the deterministic weight table
    * `w[i] = ((i*37) % 21 - 10) / 10 ∈ [-1, 1]` — a fixed pseudo-random
    * projection standing in for trained weights (the container has no
    * model artifacts; the SHAPE — hash token, look up weight, average,
    * squash — is exactly fastText inference, the classifier behind
    * CCNet/RedPajama quality and language filters).
    */
  val HashDim = 64

  /** The per-bucket integer weight table `w[b] = (b·37) % 21 - 10 ∈
    * [-10, 10]`, bucket = two md5 hex-char codes folded mod
    * [[HashDim]]. INTEGER weights make the per-document sum
    * order-independent (exact associative arithmetic), so the fold
    * order of Spark vs DuckDB's `list_sum` cannot diverge — the double
    * division happens once, after the exact sum.
    */
  private val QualityWeights: Seq[Long] =
    (0 until HashDim).map(b => ((b * 37) % 21 - 10).toLong)

  /** Per-document hashed-linear-model score: exact integer weight sum,
    * mean scaled to [-1, 1], sigmoid probability, boolean label. Fully
    * narrow — the weight sum is ONE fused codegen pass
    * ([[graft.functions.HashedWeightSum]]; the interpreted-aggregate
    * spelling digested every token twice), materialized as narrow
    * per-doc rows BEFORE the presentation sort so document TEXT never
    * crosses a shuffle (the corpusDiff discipline — the previous
    * spelling range-exchanged the raw documents to keep the sort's
    * sampling cheap, shipping the whole corpus through the exchange).
    * EAGER at the checkpoint, like the other scored-frame operators.
    * Output: (doc_id, n_words, wsum, score, prob, label).
    */
  def hashedQuality(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    TinyLoop.corpusCheckpoint(
      docs
        .select(col("doc_id"),
          size(ws).cast("long").as("n_words"),
          graft.functions.GraftFunctions.hashed_weight_sum(ws, QualityWeights)
            .as("wsum"))
        .filter(col("n_words") >= 1))
      .withColumn("score",
        Exact.round6(col("wsum").cast("double") / (lit(10.0) * col("n_words"))))
      .withColumn("prob",
        Exact.round6(lit(1.0) / (lit(1.0) + exp(-col("score")))))
      .withColumn("label", col("prob") > 0.5)
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Quality-classifier TRAINING (batch perceptron on weak labels)
  // ------------------------------------------------------------------

  /** TRAIN a hashed linear quality classifier on weak source labels and
    * score the corpus with it — the training half of the fastText-
    * classifier recipe behind CCNet/FineWeb quality filters (the
    * curated-vs-crawl discriminator; [[hashedQuality]] is the inference
    * shape with fixed weights, this LEARNS the weights). Batch
    * perceptron, `rounds` unrolled epochs:
    *
    *   w(0) = 0;  pred_i(t) = [Σ_b c_ib·w_b(t) > 0]
    *   w_b(t+1) = w_b(t) + Σ_i c_ib·(y_i − pred_i(t))
    *
    * with y_i = 1 iff source ∈ targetSources and c_ib the [[HashDim]]
    * md5-bucket token counts. EXACTNESS: the entire training loop is
    * integer arithmetic — counts, {−1,0,1} gradients, integer weight
    * sums — no learning rate, no sigmoid, no rounding policy anywhere,
    * so the DuckDB oracle replays every epoch bit-for-bit as unrolled
    * join+aggregate CTEs (the update's SCALE is irrelevant to the
    * decision boundary's sign, which is why the perceptron form needs
    * no floating point at all; round-1 weights are exactly the target
    * bucket histogram, round-2 subtracts the non-target histogram of
    * the then-misclassified docs, and so on).
    *
    * Scale: ONE tokenize pass (the [[dsirWeights]] discipline) — the
    * fused bucket-count scan checkpoints narrow per-doc rows that every
    * epoch reads back; each epoch is ONE global LongVecSumAgg
    * aggregation (64 longs out, map-side combinable) with the current
    * weights baked into the plan as a [[graft.functions.BucketDot]]
    * literal; model state is `rounds`·[[HashDim]] longs on the driver
    * (the k-means-centroid policy). Output: (doc_id, label, n_words,
    * score, pred, correct), score = the trained-weight dot product.
    */
  def perceptronQuality(
      docs: DataFrame, targetSources: Seq[String], rounds: Int = 3): DataFrame = {
    require(targetSources.nonEmpty, "perceptronQuality needs >= 1 target source")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val ws = words(col("text"))
    // Epoch 1 rides the checkpoint materialization (the dsirWeights
    // observe pattern): under w(0)=0 every prediction is 0, so the
    // epoch-1 update is exactly Σ_{y=1} c_ib — one LongVecSumAgg
    // metric on the same job that checkpoints the bucket arrays, no
    // separate epoch-1 scan.
    val (perDoc, obs) = TinyLoop.corpusCheckpointObserved(
      docs.select(
        col("doc_id"),
        when(col("source").isInCollection(targetSources), 1L).otherwise(0L)
          .as("y"),
        size(ws).cast("long").as("n_words"),
        graft.functions.GraftFunctions.hashed_bucket_counts(ws, HashDim)
          .as("bc"))
        .filter(col("n_words") >= 1),
      Seq(graft.functions.GraftFunctions.vec_sum(
        when(col("y") === 1L, col("bc")), HashDim).as("g1")))
    var w: IndexedSeq[Long] = obs.getSeq[Long](0).toIndexedSeq
    (2 to rounds).foreach { _ =>
      val g = col("y") - when(
        graft.functions.GraftFunctions.bucket_dot(col("bc"), w) > 0, 1L)
        .otherwise(0L)
      // hoist the per-row gradient scalar to its own column so the dot
      // product evaluates once per row, not once per array element
      // inside the transform lambda
      val grad = perDoc
        .select(col("bc"), g.as("g"))
        .select(graft.functions.GraftFunctions.vec_sum(
          transform(col("bc"), e => e * col("g")), HashDim).as("gr"))
        .head().getSeq[Long](0)
      w = w.zip(grad).map { case (a, b) => a + b }
    }
    perDoc
      .select(col("doc_id"), col("y").as("label"), col("n_words"),
        graft.functions.GraftFunctions.bucket_dot(col("bc"), w).as("score"))
      .withColumn("pred", col("score") > 0)
      .withColumn("correct", col("pred") === (col("label") === 1L))
      .orderBy("doc_id")
  }

  /** Shared config of the perceptron quality pair (q_quality_train /
    * q_quality_eval): weak positive labels + epoch count.
    */
  private[ops] val QualityTgt = Seq("src0", "src1", "src2", "src3")
  private[ops] val QualityRounds = 3

  /** Shared oracle prefix replaying [[perceptronQuality]]: bucket
    * counts, weak labels, `QualityRounds` unrolled epochs, and the
    * final per-doc score CTE `sf` (+ word counts `nw`) — used by both
    * the training query and the evaluation sweep.
    */
  private def perceptronScoreCtes: String = {
    val tgtIn = QualityTgt.map(s => s"'$s'").mkString("(", ", ", ")")
    val epochs = (1 to QualityRounds).map { t =>
      s"""s$t AS (SELECT c.doc_id, SUM(c.c * w${t - 1}.wt) AS s
         |        FROM c JOIN w${t - 1} USING (bkt) GROUP BY c.doc_id),
         |g$t AS (SELECT y.doc_id,
         |               y.y - (CASE WHEN COALESCE(s$t.s, 0) > 0 THEN 1 ELSE 0 END) AS g
         |        FROM y LEFT JOIN s$t USING (doc_id)),
         |d$t AS (SELECT c.bkt, SUM(c.c * g$t.g) AS d
         |        FROM c JOIN g$t USING (doc_id) GROUP BY c.bkt),
         |w$t AS (SELECT w${t - 1}.bkt, w${t - 1}.wt + COALESCE(d$t.d, 0) AS wt
         |        FROM w${t - 1} LEFT JOIN d$t USING (bkt))""".stripMargin
    }.mkString(",\n")
    s"""w AS (SELECT doc_id, source, unnest($WordsSql) AS t FROM documents),
       |b AS (SELECT doc_id,
       |             (ascii(substr(md5(t),1,1)) * 16 + ascii(substr(md5(t),2,1))) % $HashDim AS bkt
       |      FROM w),
       |c AS (SELECT doc_id, bkt, COUNT(*) AS c FROM b GROUP BY doc_id, bkt),
       |y AS (SELECT doc_id, CASE WHEN source IN $tgtIn THEN 1 ELSE 0 END AS y
       |      FROM documents WHERE len($WordsSql) >= 1),
       |w0 AS (SELECT DISTINCT bkt, CAST(0 AS BIGINT) AS wt FROM c),
       |$epochs,
       |sf AS (SELECT c.doc_id, SUM(c.c * w$QualityRounds.wt) AS s
       |       FROM c JOIN w$QualityRounds USING (bkt) GROUP BY c.doc_id),
       |nw AS (SELECT doc_id, COUNT(*) AS n FROM b GROUP BY doc_id)""".stripMargin
  }

  /** Threshold-calibration table over [[perceptronQuality]]'s scores:
    * 10 value-grid thresholds, per-threshold tp/fp/fn +
    * precision/recall/F1, and the F1-argmax operating point (ties to
    * the smaller threshold index). Output:
    * (i, thr, tp, fp, fn, prec, rec, f1, best) — 10 rows.
    *
    * Scale shape: the corpus collapses to a per-score histogram in one
    * exchange; the sweep is histogram × 10 broadcast grid rows (the
    * corpus is never rescanned per threshold); the argmax is a 1-row
    * struct-max aggregate, never a window.
    */
  def qualityEval(
      docs: DataFrame, targetSources: Seq[String], rounds: Int = 3): DataFrame = {
    val hist = perceptronQuality(docs, targetSources, rounds)
      .groupBy("score")
      .agg(sum(col("label")).as("pos"), sum(lit(1L) - col("label")).as("neg"))
    val bounds = hist.agg(min(col("score")).as("smin"), max(col("score")).as("smax"),
      sum(col("pos")).as("npos"))
    // thr_i = smin + (smax − smin)·(i−1) div 10: exact integer
    // arithmetic, spelled `div`/`//` identically in both engines
    val grid = bounds
      .select(explode(sequence(lit(1), lit(10))).as("i"),
        col("smin"), col("smax"), col("npos"))
      .select(col("i"),
        expr("smin + (smax - smin) * (i - 1) div 10").as("thr"), col("npos"))
    val f = hist.crossJoin(broadcast(grid))
      .groupBy("i", "thr", "npos")
      .agg(
        sum(when(col("score") > col("thr"), col("pos")).otherwise(0L)).as("tp"),
        sum(when(col("score") > col("thr"), col("neg")).otherwise(0L)).as("fp"))
      .select(col("i"), col("thr"), col("tp"), col("fp"),
        (col("npos") - col("tp")).as("fn"),
        when(col("tp") + col("fp") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))).as("prec"),
        when(col("npos") === 0, 0.0)
          .otherwise(col("tp").cast("double") / col("npos")).as("rec"),
        when(lit(2) * col("tp") + col("fp") + (col("npos") - col("tp")) === 0, 0.0)
          .otherwise(lit(2.0) * col("tp")
            / (lit(2) * col("tp") + col("fp") + (col("npos") - col("tp")))).as("f1"))
    // F1-argmax via a 1-row struct-max (f1 doubles are identical
    // integer-ratio values in both engines, so the argmax is too);
    // negated index turns the struct max's tie-break into "smallest i"
    val best = f.agg(max(struct(col("f1"), (-col("i")).as("ni"))).as("b"))
      .select((-col("b.ni")).cast("int").as("best_i"))
    f.crossJoin(broadcast(best))
      .select(col("i"), col("thr"), col("tp"), col("fp"), col("fn"),
        col("prec"), col("rec"), col("f1"),
        (col("i") === col("best_i")).as("best"))
      .boundedSort("i")
  }

  // ------------------------------------------------------------------
  // DSIR-style hashed importance weighting (target-domain selection)
  // ------------------------------------------------------------------

  /** Hashed importance weights for target-domain data selection — the
    * DSIR shape (Xie et al. 2023, "Data Selection for Language Models
    * via Importance Resampling"): estimate target and raw unigram
    * distributions over HASHED features (the same [[HashDim]] md5
    * buckets as [[hashedQuality]]), weight every document by its
    * tokens' mean target/raw probability ratio, and keep documents
    * that look more target-like than average — the step that tilts a
    * web-scale crawl toward a curated domain (books, wiki, code).
    *
    * Exactness: the per-bucket ratio is computed ONCE, driver-side, in
    * BigInt — `rint(b) = (ct(b)·Nr·1000) / (cr(b)·Nt)`, a milli-ratio
    * — which matches DuckDB's HUGEINT `//` exactly at any magnitude;
    * per-document sums are then exact associative integer sums on both
    * engines (the [[hashedQuality]] discipline), and the only double
    * appears in the final presentation division under `Exact.round6`.
    *
    * Scale: ONE tokenize pass total (r13) — the fused bucket-count scan
    * checkpoints narrow per-doc rows (doc_id + 64-long array, ~0.5% of
    * corpus bytes) that both the histogram aggregation and the scoring
    * dot product read back; no token is ever hashed twice. The 64-row
    * histogram — MODEL STATE, the k-means-centroid policy — collects to
    * the driver and bakes into a literal array: the scoring pass is a
    * fully narrow projection with no join against the histogram at all.
    * Like `bigramLogProb`, construction is eager (the model-state
    * collect runs at call time), so this composes as a batch-corpus
    * operator, not a lazily-planned view.
    */
  def dsirWeights(docs: DataFrame, targetSources: Seq[String]): DataFrame = {
    require(targetSources.nonEmpty, "dsirWeights needs >= 1 target source")
    val ws = words(col("text"))
    // Tokenize ONCE (r13, closing the r12 perf-weak verdict): a single
    // graft_hashed_bucket_counts scan emits each document's 64-slot
    // bucket-count array — no per-token explode rows ever materialize —
    // checkpointed as NARROW per-doc rows (doc_id + flag + n_words +
    // 64 longs, ~0.5% of corpus bytes) that BOTH passes read back.
    // The old spelling ran the tokenize+md5 scan twice: once for the
    // histogram, then again inside HashedWeightSum for scoring — the
    // second pass recomputed what is algebraically dot(bc, ratio) over
    // the arrays the first pass already produced. Bucket arithmetic is
    // shared code with HashedWeightSum, so the counts are the explode +
    // groupBy spelling's exactly (fused-vs-explode parity spec'd in
    // FilterExprsSpec).
    // The histogram rides the SAME job as the checkpoint via observe/
    // CollectMetrics (one LongVecSumAgg vector add per row): raw
    // counts over every doc, target counts over `when(is_tgt, bc)` —
    // null for non-target docs and for null `source` (isInCollection
    // is null-propagating), which the agg skips: the old
    // when(...).otherwise(0) spelling's semantics. The 64-column
    // sum(element_at) histogram this replaces blew the whole-stage-
    // codegen field budget and ran interpreted as its own job
    // (0.53–0.70 s warm at sf0.1 vs ~0.1 s riding the scan).
    val (perDoc, hist) = TinyLoop.corpusCheckpointObserved(
      docs.select(
        col("doc_id"),
        col("source").isInCollection(targetSources).as("is_tgt"),
        size(ws).cast("long").as("n_words"),
        graft.functions.GraftFunctions.hashed_bucket_counts(ws, HashDim)
          .as("bc")),
      Seq(
        graft.functions.GraftFunctions.vec_sum(col("bc"), HashDim).as("cr"),
        graft.functions.GraftFunctions.vec_sum(
          when(col("is_tgt"), col("bc")), HashDim).as("ct")))
    val crArr = hist.getSeq[Long](0).toArray
    val ctArr = hist.getSeq[Long](1).toArray
    val nr = crArr.sum
    val nt = ctArr.sum
    require(nt > 0,
      s"dsirWeights: no tokens found in target sources $targetSources")
    val rint = Array.fill(HashDim)(0L)
    (0 until HashDim).foreach { b =>
      if (crArr(b) > 0)
        rint(b) = (BigInt(ctArr(b)) * nr * 1000 / (BigInt(crArr(b)) * nt)).toLong
    }
    // scoring pass: codegen dot product of each checkpointed
    // bucket-count array against the collected ratio table (model state
    // baked into the plan) — integer-identical to the old
    // HashedWeightSum re-scan (Σ_tokens w[bucket(t)] = Σ_b count_b·w_b,
    // parity spec'd in FilterExprsSpec) with zero re-tokenization. The
    // narrow checkpointed rows keep the presentation sort's sampling
    // cheap and text off every exchange (the corpusDiff discipline).
    val scored = perDoc
      .select(col("doc_id"), col("n_words"),
        graft.functions.GraftFunctions.bucket_dot(
          col("bc"), rint.toIndexedSeq).as("wsum"))
      .filter(col("n_words") >= 1)
    scored
      .withColumn("avg_ratio",
        Exact.round6(col("wsum").cast("double") / (lit(1000.0) * col("n_words"))))
      .withColumn("keep", col("wsum") >= lit(1000L) * col("n_words"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Registered queries
  // ------------------------------------------------------------------

  def queries: Seq[Q] = Seq(
    // Per-source PII audit: how much PII does each source carry, and
    // how many characters does scrubbing remove — the report a curation
    // run emits before/after redaction.
    Q(
      "q_pii_scrub",
      s"""WITH p AS (
         |  SELECT doc_id, source, $PiiTextSql AS pii_text
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, source, pii_text,
         |         len(regexp_extract_all(pii_text, '$EmailRe')) AS n_emails,
         |         len(regexp_extract_all(pii_text, '$Ipv4Re')) AS n_ips,
         |         len(regexp_extract_all(pii_text, '$PhoneRe')) AS n_phones,
         |         regexp_replace(regexp_replace(regexp_replace(pii_text,
         |           '$EmailRe', '[EMAIL]', 'g'),
         |           '$Ipv4Re', '[IP]', 'g'),
         |           '$PhoneRe', '[PHONE]', 'g') AS scrubbed
         |  FROM p)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(n_emails) AS BIGINT) AS n_emails,
         |       CAST(SUM(n_ips) AS BIGINT) AS n_ips,
         |       CAST(SUM(n_phones) AS BIGINT) AS n_phones,
         |       CAST(SUM(length(pii_text) - length(scrubbed)) AS BIGINT) AS chars_redacted
         |FROM s GROUP BY source ORDER BY source"""
    ) { (s, d) =>
      val dirty = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), piiText.as("pii_text"))
      piiScrub(dirty, "pii_text")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_emails")).cast("long").as("n_emails"),
          sum(col("n_ips")).cast("long").as("n_ips"),
          sum(col("n_phones")).cast("long").as("n_phones"),
          sum(length(col("pii_text")) - length(col("scrubbed")))
            .cast("long").as("chars_redacted"))
        .boundedSort("source")
    },

    // Paragraph-level dedup statistics + the CCNet drop rule.
    Q(
      "q_line_dedup",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents
         |           WHERE len($WordsSql) >= 1),
         |l AS (SELECT doc_id,
         |             unnest(list_transform(range(0, CAST(ceil(len(ws) / 3.0) AS INT)),
         |                    i -> array_to_string(list_slice(ws, CAST(i*3+1 AS INT), CAST(i*3+3 AS INT)), ' '))) AS line
         |      FROM w),
         |c AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY unhex(md5(line))) AS cnt FROM l)
         |SELECT doc_id, COUNT(*) AS n_lines,
         |       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
         |       floor(CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6 AS dup_frac,
         |       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) <= 0.5 AS keep
         |FROM c GROUP BY doc_id ORDER BY doc_id"""
    ) { (s, d) => lineDupStats(Tables.documents(s, d)) },

    // Domain-frequency table from in-text URLs.
    Q(
      "q_url_extract",
      s"""WITH p AS (
         |  SELECT doc_id,
         |         text || ' see https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)
         |              || ' or http://cdn-' || lang || '.example.net/asset/' || CAST(doc_id % 100 AS VARCHAR) AS utext
         |  FROM documents),
         |u AS (SELECT doc_id, unnest(regexp_extract_all(utext, '$UrlRe')) AS url FROM p)
         |SELECT regexp_extract(url, '$DomainRe', 1) AS domain,
         |       COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs
         |FROM u GROUP BY 1 ORDER BY domain"""
    ) { (s, d) =>
      val dirty = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" see https://"), col("source"), lit(".example.com/p/"),
          col("doc_id").cast("string"),
          lit(" or http://cdn-"), col("lang"), lit(".example.net/asset/"),
          (col("doc_id") % 100).cast("string")).as("utext"))
      urlDomains(dirty, "utext")
    },

    // Corpus snapshot diff between two synthesized versions: v1 drops
    // doc_id % 9 = 0 (so those read as ADDED in v2), v2 drops
    // doc_id % 7 = 0 (REMOVED) and appends an edit marker to
    // doc_id % 11 = 0 (CHANGED fingerprint); everything else is SAME.
    Q(
      "q_corpus_diff",
      s"""WITH v1 AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 9 <> 0),
         |v2 AS (SELECT doc_id, source,
         |              CASE WHEN doc_id % 11 = 0 THEN text || ' edited v2' ELSE text END AS text
         |       FROM documents WHERE doc_id % 7 <> 0),
         |a AS (SELECT doc_id, source,
         |             md5(trim(regexp_replace(lower(text), '${TextOps.WsReDuck}', ' ', 'g'))) AS fp,
         |             CAST(len($WordsSql) AS BIGINT) AS tk FROM v1),
         |b AS (SELECT doc_id, source,
         |             md5(trim(regexp_replace(lower(text), '${TextOps.WsReDuck}', ' ', 'g'))) AS fp,
         |             CAST(len($WordsSql) AS BIGINT) AS tk FROM v2),
         |j AS (SELECT COALESCE(b.source, a.source) AS source,
         |             CASE WHEN a.fp IS NULL THEN 'added'
         |                  WHEN b.fp IS NULL THEN 'removed'
         |                  WHEN a.fp = b.fp THEN 'same'
         |                  ELSE 'changed' END AS status,
         |             COALESCE(b.tk, 0) - COALESCE(a.tk, 0) AS dtk
         |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
         |SELECT source,
         |       CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         |       CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         |       CAST(SUM(CASE WHEN status = 'same' THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
         |       CAST(SUM(dtk) AS BIGINT) AS token_delta
         |FROM j GROUP BY source ORDER BY source"""
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val v1 = docs.filter(col("doc_id") % 9 =!= 0)
        .select(col("doc_id"), col("source"), col("text"))
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" edited v2")))
            .otherwise(col("text")).as("text"))
      corpusDiff(v1, v2)
    },

    // Typographic normalization over deterministically dirtied text
    // (three dirty arms — curly quotes + NBSP, control char + double
    // space + em-dash, ellipsis + en-dash — and one clean arm).
    Q(
      "q_text_normalize",
      s"""WITH p AS (
         |  SELECT doc_id, source,
         |         text || CASE doc_id % 4
         |                 WHEN 0 THEN ' ' || chr(160) || '‘w’ “q”'
         |                 WHEN 1 THEN '  two' || chr(7) || ' — dash'
         |                 WHEN 2 THEN ' tail… – x'
         |                 ELSE '' END AS dirty
         |  FROM documents),
         |n AS (SELECT doc_id, source, dirty,
         |             ${normalizeTextSql("dirty")} AS norm
         |      FROM p)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN norm <> dirty THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         |       CAST(SUM(length(dirty)) AS BIGINT) AS chars_before,
         |       CAST(SUM(length(norm)) AS BIGINT) AS chars_after
         |FROM n GROUP BY source ORDER BY source"""
    ) { (s, d) =>
      val m = col("doc_id") % 4
      val dirty = concat(col("text"),
        when(m === 0, lit(" \u00A0‘w’ “q”"))
          .when(m === 1, lit("  two\u0007 — dash"))
          .when(m === 2, lit(" tail… – x"))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), dirty.as("dirty"))
        .withColumn("norm", normalizeText(col("dirty")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("norm") =!= col("dirty"), 1).otherwise(0))
            .cast("long").as("n_changed"),
          sum(length(col("dirty"))).cast("long").as("chars_before"),
          sum(length(col("norm"))).cast("long").as("chars_after"))
        .boundedSort("source")
    },

    // URL blocklist gate over a synthesized per-doc home URL
    // (host = {lang}.{source}.example.com, a tracker path for doc_id
    // % 97 = 0): three registered domains block all their subdomains,
    // one exact host blocks a single language edition, and the path
    // rule catches the tracker segment. See urlBlocklistGate.
    {
      val blocked = Seq("src3.example.com", "src7.example.com",
        "src12.example.com", "de.src5.example.com")
      val blockedIn = blocked.map(b => s"'$b'").mkString("[", ", ", "]")
      Q(
        "q_url_blocklist",
        s"""WITH p AS (
           |  SELECT doc_id, source,
           |         'https://' || lang || '.' || source || '.example.com/'
           |           || CASE WHEN doc_id % 97 = 0 THEN 'tracker/' ELSE 'page/' END
           |           || CAST(doc_id AS VARCHAR) AS url
           |  FROM documents),
           |h AS (
           |  SELECT source, url,
           |         lower(regexp_replace(regexp_replace(
           |           regexp_extract(url, '$GateHostRe', 1), '^.*@', ''), ':[0-9]+$$', '')) AS host,
           |         regexp_extract(url, '$GatePathRe', 1) AS path
           |  FROM p),
           |st AS (
           |  SELECT source,
           |         CASE WHEN len(list_filter($blockedIn,
           |                        b -> host = b OR ends_with(host, '.' || b))) > 0
           |              THEN 'blocked_domain'
           |              WHEN contains(path, '/tracker/') THEN 'blocked_path'
           |              ELSE 'kept' END AS status
           |  FROM h)
           |SELECT source, COUNT(*) AS n_docs,
           |       CAST(SUM(CASE WHEN status = 'blocked_domain' THEN 1 ELSE 0 END) AS BIGINT) AS blocked_domain,
           |       CAST(SUM(CASE WHEN status = 'blocked_path' THEN 1 ELSE 0 END) AS BIGINT) AS blocked_path,
           |       CAST(SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS kept
           |FROM st GROUP BY source ORDER BY source"""
      ) { (s, d) =>
        val withUrl = Tables.documents(s, d).select(col("doc_id"), col("source"),
          concat(lit("https://"), col("lang"), lit("."), col("source"),
            lit(".example.com/"),
            when(col("doc_id") % 97 === 0, "tracker/").otherwise("page/"),
            col("doc_id").cast("string")).as("url"))
        urlBlocklistGate(withUrl, "url", blocked, "/tracker/")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("status") === "blocked_domain", 1).otherwise(0))
              .cast("long").as("blocked_domain"),
            sum(when(col("status") === "blocked_path", 1).otherwise(0))
              .cast("long").as("blocked_path"),
            sum(when(col("status") === "kept", 1).otherwise(0))
              .cast("long").as("kept"))
          .boundedSort("source")
      }
    },

    // DSIR importance weighting: src0-src3 as the target domain.
    {
      val tgt = Seq("src0", "src1", "src2", "src3")
      val tgtIn = tgt.map(s => s"'$s'").mkString("(", ", ", ")")
      Q(
        "q_dsir_weights",
        s"""WITH w AS (SELECT doc_id, source, unnest($WordsSql) AS t FROM documents),
           |b AS (SELECT doc_id, source,
           |             (ascii(substr(md5(t),1,1)) * 16 + ascii(substr(md5(t),2,1))) % $HashDim AS bkt
           |      FROM w),
           |h AS (SELECT bkt, COUNT(*) AS cr,
           |             SUM(CASE WHEN source IN $tgtIn THEN 1 ELSE 0 END) AS ct
           |      FROM b GROUP BY bkt),
           |tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM h),
           |r AS (SELECT bkt, (ct * nr * 1000) // (cr * nt) AS rint FROM h, tot),
           |s AS (SELECT doc_id, COUNT(*) AS n_words, SUM(rint) AS wsum
           |      FROM b JOIN r USING (bkt) GROUP BY doc_id)
           |SELECT doc_id, n_words,
           |       CAST(wsum AS BIGINT) AS wsum,
           |       floor(CAST(wsum AS DOUBLE) / (1000.0 * n_words) * 1e6 + 0.5) / 1e6 AS avg_ratio,
           |       wsum >= 1000 * n_words AS keep
           |FROM s ORDER BY doc_id"""
      ) { (s, d) => dsirWeights(Tables.documents(s, d), tgt) }
    },

    // Quality-classifier TRAINING: 3 batch-perceptron epochs on weak
    // source labels (src0-src3 = positive), then score the corpus with
    // the trained weights. Pure integer arithmetic end-to-end, so the
    // oracle replays every epoch as unrolled join+aggregate CTEs.
    Q(
      "q_quality_train",
      s"""WITH $perceptronScoreCtes
         |SELECT y.doc_id, CAST(y.y AS BIGINT) AS label,
         |       CAST(nw.n AS BIGINT) AS n_words,
         |       CAST(COALESCE(sf.s, 0) AS BIGINT) AS score,
         |       COALESCE(sf.s, 0) > 0 AS pred,
         |       (COALESCE(sf.s, 0) > 0) = (y.y = 1) AS correct
         |FROM y JOIN nw USING (doc_id) LEFT JOIN sf USING (doc_id)
         |ORDER BY doc_id"""
    ) { (s, d) => perceptronQuality(Tables.documents(s, d), QualityTgt, QualityRounds) },

    // Classifier EVALUATION + threshold calibration over the trained
    // perceptron's scores — the table a curation team reads before
    // deploying the gate: a 10-point value-grid threshold sweep
    // (thr_i = smin + (smax−smin)·(i−1) div 10 — exact integer
    // arithmetic, no order statistics, no window) with per-threshold
    // tp/fp/fn counts and precision/recall/F1, plus the F1-argmax
    // operating point (ties to the smallest threshold). Scale shape:
    // corpus → per-score histogram (ONE exchange on the integer
    // score), 1-row min/max/npos aggregate, then the sweep runs over
    // the histogram × 10 broadcast grid rows — the corpus is never
    // rescanned per threshold. All ratios are IEEE divisions of exact
    // integer counts, identical in both engines.
    Q(
      "q_quality_eval",
      s"""WITH $perceptronScoreCtes,
         |sc AS (SELECT y.doc_id, y.y AS label, COALESCE(sf.s, 0) AS score
         |       FROM y LEFT JOIN sf USING (doc_id)),
         |hist AS (SELECT score, SUM(label) AS pos, SUM(1 - label) AS neg
         |         FROM sc GROUP BY score),
         |bounds AS (SELECT MIN(score) AS smin, MAX(score) AS smax,
         |                  CAST(SUM(pos) AS BIGINT) AS npos
         |           FROM hist),
         |grid AS (SELECT CAST(t.i AS INT) AS i,
         |                CAST(b.smin + (b.smax - b.smin) * (t.i - 1) // 10 AS BIGINT) AS thr,
         |                b.npos
         |         FROM generate_series(1, 10) AS t(i), bounds b),
         |ev AS (SELECT g.i, g.thr, g.npos,
         |              CAST(SUM(CASE WHEN h.score > g.thr THEN h.pos ELSE 0 END) AS BIGINT) AS tp,
         |              CAST(SUM(CASE WHEN h.score > g.thr THEN h.neg ELSE 0 END) AS BIGINT) AS fp
         |       FROM grid g CROSS JOIN hist h GROUP BY g.i, g.thr, g.npos),
         |f AS (SELECT i, thr, tp, fp, npos - tp AS fn,
         |             CASE WHEN tp + fp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS prec,
         |             CASE WHEN npos = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / npos END AS rec,
         |             CASE WHEN 2 * tp + fp + (npos - tp) = 0 THEN 0.0
         |                  ELSE 2.0 * tp / (2 * tp + fp + (npos - tp)) END AS f1
         |      FROM ev)
         |SELECT i, thr, tp, fp, fn, prec, rec, f1,
         |       i = (SELECT i FROM f ORDER BY f1 DESC, i LIMIT 1) AS best
         |FROM f ORDER BY i"""
    ) { (s, d) =>
      qualityEval(Tables.documents(s, d), QualityTgt, QualityRounds)
    },

    // Hashed linear-model inference per document.
    Q(
      "q_quality_classifier",
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |s AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |             CAST(list_sum(list_transform(ws,
         |               t -> ((ascii(substr(md5(t),1,1)) * 16 + ascii(substr(md5(t),2,1))) % $HashDim * 37) % 21 - 10)) AS BIGINT) AS wsum
         |      FROM w WHERE len(ws) >= 1),
         |r AS (SELECT doc_id, n_words, wsum,
         |             floor(CAST(wsum AS DOUBLE) / (10.0 * n_words) * 1e6 + 0.5) / 1e6 AS score
         |      FROM s),
         |q AS (SELECT doc_id, n_words, wsum, score,
         |             floor(1.0 / (1.0 + exp(-score)) * 1e6 + 0.5) / 1e6 AS prob
         |      FROM r)
         |SELECT doc_id, n_words, wsum, score, prob, prob > 0.5 AS label
         |FROM q ORDER BY doc_id"""
    ) { (s, d) => hashedQuality(Tables.documents(s, d)) }
  )
}
