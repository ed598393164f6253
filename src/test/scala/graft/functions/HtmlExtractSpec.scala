package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the fused [[HtmlTextUtil]] scans against the published rule
  * chain spelled with Spark's own regexp/replace builtins (the same
  * patterns the DuckDB oracle runs — see HtmlOps): any divergence
  * between the hand-rolled passes and the regex-chain spec fails here
  * before it can hash-mismatch an oracle. Adversarial cases cover the
  * regex engine's edge behaviors the scans must reproduce exactly:
  * advance-by-one on failed matches, first-'>'-ends-a-tag, lazy close
  * search, unterminated constructs left in place.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private val W = """[ \t\r\n\f]"""

  private def flat(c: Column): Column = {
    def elem(x: Column, tag: String): Column =
      regexp_replace(x, s"(?is)<$tag($W[^>]*)?>.*?</$tag$W*>", "")
    val noC = regexp_replace(c, "(?s)<!--.*?-->", "")
    val noE = HtmlTextUtil.StrippedElements.foldLeft(noC)(elem)
    val ws1 = regexp_replace(noE, s"$W+", " ")
    regexp_replace(ws1,
      s"(?i)</?(${HtmlTextUtil.blockAlt})($W[^>]*)?/?$W*>", "\n")
  }

  private def clean(x: Column): Column = {
    val deT = regexp_replace(x, "<[^>]*>", "")
    val deE = HtmlTextUtil.Entities.foldLeft(deT) { case (a, (e, v)) =>
      regexp_replace(a, java.util.regex.Pattern.quote(e), v)
    }
    trim(regexp_replace(deE, " +", " "))
  }

  private def builtinsLines(c: Column): Column =
    filter(transform(split(flat(c), "\n", -1), l => clean(l)),
      l => l =!= "")

  private def builtinsLinkChars(c: Column): Column =
    transform(split(flat(c), "\n", -1), l =>
      struct(clean(l).as("line"),
        // Spark's length() counts CODE POINTS — the contract the fused
        // scan's n_chars/n_link_chars must match on non-BMP text
        length(clean(l)).as("nchars"),
        aggregate(
          transform(regexp_extract_all(l,
            lit(s"(?is)<a($W[^>]*)?>(.*?)</a$W*>"), lit(2)),
            x => length(clean(x))),
          lit(0), (a, b) => a + b).as("nlink")))

  private val adversarial = Seq(
    "",
    "plain text only",
    "a < b and c > d",
    "x <!-- comment <p>inside</p> --> y",
    "unterminated <!-- comment <p>stays",
    "<!-- c1 --><p>a</p><!-- c2 -->",
    "<script>var a = '<p>';</script>after",
    "<script src=\"x.js\"></script>tail",
    "<SCRIPT>upper</SCRIPT>ok",
    "<script>a<script>b</script>c</script>tail",
    "<script>no close tag",
    "<scriptx>not a script</scriptx>",
    "<script>x</scriptx> leak </script>done",
    "<style >spaced</style >t",
    "<head><title>T</title><meta x=y></head>body",
    "<p>a</p><P>b</P><p/>c<p />d<p/ >e",
    "<pre>pre block</pre><para>not a block</para>",
    "<h1>one</h1><h6>six</h6><h16>not</h16><hr/>",
    "<div attr=\"a>b\">split at first gt</div>",
    "a\r\n\t\fb   c",
    "<ul><li>i1</li><li>i2</li></ul>",
    "<a href=\"/x\">Link</a> rest of line",
    "<a>1</a><a>2</a> two links",
    "<a><b>bold</b> inner</a> mixed",
    "<a>unclosed anchor",
    "<a>x</abbr></a> tricky close",
    "<abbr>not anchor</abbr>",
    "text &amp;lt; double escape",
    "&lt;tag&gt; &quot;q&quot; it&#39;s &apos;a&apos; x&nbsp;y &amp; &unknown;",
    "&nbsp;&nbsp;&nbsp;",
    "<p>  spaced   words  </p>",
    "no entities & loose ampersand",
    "<br>line<br/>breaks<br />here",
    "<td>cell</td><th>head</th><caption>cap</caption>",
    "<blockquote cite=\"x\">q</blockquote><address>ad</address>",
    // non-BMP (supplementary plane): counts must be CODE POINTS, not
    // UTF-16 units — "a<a>😀</a>" keeps under code points (2·1 <= 2)
    // but would drop under UTF-16 units (2·2 > 3)
    "a<a>😀</a>",
    "<a href=\"/e\">🦀🦀</a> 🌍 tail",
    "😀😀 boundary <p>😀</p> &amp; 🌍",
    // r14 stripped elements: fallback/vector/inert markup never reaches
    // the token stream; unterminated forms stay (regex won't match)
    "<noscript>enable js</noscript>after",
    "<svg viewBox=\"0 0 1 1\"><circle r=\"1\"/></svg>tail",
    "<template><p>inert</p></template>x",
    "<iframe src=\"/e\">fallback</iframe>y",
    "<IFRAME>upper</IFRAME>ok",
    "<noscript>no close tag",
    "<svgx>not svg</svgx>")

  private def fixtureHtml = {
    val docs = graft.Tables.documents(spark, sfDir).limit(64)
    docs.select(graft.ops.HtmlOps.htmlWrapCol.as("html"))
  }

  test("html_extract text/main_text == builtins regex chain (fixture + adversarial)") {
    val adv = adversarial.toDF("html")
    Seq(adv, fixtureHtml).foreach { df =>
      val got = df.select(
        GraftFunctions.html_extract(col("html")).as("x"),
        builtinsLines(col("html")).as("bl"),
        col("html"))
        .select(
          col("x.text"), col("x.main_text"), col("x.n_lines"), col("x.n_kept"),
          array_join(col("bl"), "\n"), size(col("bl")), col("html"))
        .collect()
      got.foreach { r =>
        assert(r.getString(0) == r.getString(4),
          s"text mismatch on '${r.getString(6)}'")
        assert(r.getInt(2) == r.getInt(5),
          s"n_lines mismatch on '${r.getString(6)}'")
      }
    }
  }

  test("html_lines == builtins per-line link stats (fixture + adversarial)") {
    val adv = adversarial.toDF("html")
    Seq(adv, fixtureHtml).foreach { df =>
      val got = df.select(
        GraftFunctions.html_lines(col("html")).as("ls"),
        filter(builtinsLinkChars(col("html")),
          s => s.getField("line") =!= "").as("bs"),
        col("html"))
        .collect()
      got.foreach { r =>
        val mine = r.getSeq[org.apache.spark.sql.Row](0)
          .map(x => (x.getString(0), x.getInt(1), x.getInt(2)))
        val ref = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getString(0), x.getInt(1), x.getInt(2)))
        assert(mine == ref, s"line stats mismatch on '${r.getString(2)}'")
      }
    }
  }

  test("keep gate counts code points: astral divergence case keeps") {
    // Under UTF-16 units this line would read nLink=2, nChars=3 and
    // drop (4 > 3); code points give 2·1 <= 2 — keep.
    val x = Seq("a<a>😀</a>").toDF("html")
      .select(GraftFunctions.html_extract(col("html")).as("x"))
      .select("x.main_text", "x.n_kept").collect().head
    assert(x.getString(0) == "a😀" && x.getInt(1) == 1,
      s"astral keep-gate divergence: got '${x.getString(0)}' kept=${x.getInt(1)}")
  }

  test("main-content gate: nav/footer boilerplate drops, content and h1 stay") {
    val html = fixtureHtml.limit(1).collect().head.getString(0)
    val x = Seq(html).toDF("html")
      .select(GraftFunctions.html_extract(col("html")).as("x"))
      .select("x.text", "x.main_text").collect().head
    val all = x.getString(0).split("\n").toSeq
    val main = x.getString(1).split("\n").toSeq
    assert(all.contains("Home") && all.contains("About"),
      s"nav lines missing from stage-1 text: $all")
    assert(!main.exists(_.contains("Home")) && !main.exists(_.contains("About")),
      s"nav lines leaked into main content: $main")
    assert(!main.exists(_.contains("Terms of Service")),
      s"footer leaked into main content: $main")
    // the link-free cookie banner PASSES the per-line link gate (the
    // documented gap q_html_blocks closes at block level)
    assert(main.head == "Accept cookies Subscribe now",
      s"banner line missing from link-gated main: $main")
    assert(main(1).startsWith("Doc "), s"h1 line missing: $main")
    assert(main.exists(_.startsWith("Tags & entities: <doc ")),
      s"entity line not decoded: $main")
    // stripped-element content never reaches stage-1 text at all
    Seq("Enable JavaScript", "logo vector art", "inert template",
      "iframe fallback").foreach { leak =>
      assert(!all.exists(_.contains(leak)), s"stripped element leaked '$leak': $all")
    }
  }

  test("null input propagates null; interpreted == codegen") {
    val r = Seq(Option.empty[String]).toDF("html")
      .select(GraftFunctions.html_extract(col("html")),
        GraftFunctions.html_lines(col("html"))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    val df = adversarial.toDF("html")
    val cols = Seq(
      GraftFunctions.html_extract(col("html")),
      GraftFunctions.html_lines(col("html")))
    val codegen = df.select(cols: _*).collect().toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(cols: _*).collect().toSeq
      assert(codegen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
