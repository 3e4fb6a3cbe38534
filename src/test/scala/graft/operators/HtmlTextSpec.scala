package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlTextSpec extends SparkSpec {

  import spark.implicits._

  private val page =
    """<!DOCTYPE html>
      |<html>
      |<head>
      |  <title>Ignored Title</title>
      |  <style>body { color: red; } /* p { } */</style>
      |  <script src="x.js"></script>
      |</head>
      |<body>
      |  <!-- navigation -->
      |  <nav><ul>
      |    <li><a href="/">Home sweet home page</a></li>
      |    <li><a href="/about">About us and the team</a></li>
      |    <li><a href="/contact">Contact &amp; support desk</a></li>
      |  </ul></nav>
      |  <article>
      |    <h1>Quarterly analytics engine report</h1>
      |    <p>The analytics engine processed a <b>record</b> volume this
      |       quarter, with throughput up 40% according to the
      |       <a href="/report">published report</a> released on Monday.</p>
      |    <p>Costs fell as the new scheduler &quot;bin-packs&quot; small
      |       queries onto warm executors &#39;opportunistically&#39; &mdash;
      |       engineers say cache &gt; recompute for hot partitions.</p>
      |    <div class="related">
      |      <a href="/a">Related story one</a> &middot;
      |      <a href="/b">Related story two</a> &middot;
      |      <a href="/c">Related story three</a>
      |    </div>
      |  </article>
      |  <footer><a href="/tos">Terms</a> <a href="/privacy">Privacy</a> © 2026</footer>
      |  <script>trackPageView();</script>
      |</body>
      |</html>""".stripMargin

  test("extractText: prose survives, nav/related/footer boilerplate drops") {
    val got = Seq(Tuple1(page)).toDF("html")
      .select(HtmlText.extractText(col("html")).as("t")).head.getString(0)
    val blocks = got.split("\n")
    assert(blocks.length == 3, s"heading + two paragraphs expected, got: $got")
    assert(blocks(0) == "Quarterly analytics engine report")
    assert(blocks(1).startsWith("The analytics engine processed a record volume"))
    assert(blocks(1).contains("published report released on Monday."),
      "inline <a> and <b> strip to their text; prose link density stays low")
    assert(blocks(2).contains("\"bin-packs\"") && blocks(2).contains("'opportunistically'"),
      s"entities decode: $got")
    assert(blocks(2).contains("cache > recompute"))
    assert(!got.contains("Home sweet home"), "nav is link-dense boilerplate")
    assert(!got.contains("Related story"), "related-links row is link-dense")
    assert(!got.contains("Terms"), "footer drops (short + link-dense)")
    assert(!got.contains("Ignored Title") && !got.contains("color: red") &&
      !got.contains("trackPageView"), "head/style/script never contribute text")
    // the title is still reachable through the dedicated extractor
    val title = Seq(Tuple1(page)).toDF("html")
      .select(HtmlText.extractTitle(col("html"))).head.getString(0)
    assert(title == "Ignored Title")
    assert(Seq(Tuple1("<p>no head</p>")).toDF("html")
      .select(HtmlText.extractTitle(col("html"))).head.getString(0) == "")
  }

  test("extractText: degenerate inputs are total, never null") {
    val df = Seq(
      (1L, ""), (2L, "no tags at all but long enough to pass the minimum"),
      (3L, "<p>short</p>"), (4L, "<div><a href='/'>all link text long enough here</a></div>"),
      (5L, "<p>unclosed <b>bold stays visible and this line is long enough</p>")
    ).toDF("id", "html")
    val got = df.select(col("id"), HtmlText.extractText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "")
    assert(got(2L).startsWith("no tags at all"))
    assert(got(3L) == "", "below minChars drops")
    assert(got(4L) == "", "pure-link block drops at any length")
    assert(got(5L).contains("bold stays visible"))
    assert(!got.values.exists(_ == null))
  }

  test("extractLinks: quote pairing, document order across quote styles, odd hrefs") {
    val html = "<html><body>" +
      "<a href=\"it's\">apostrophe inside double quotes survives</a>" +
      "<a href='say \"hi\"'>double quote inside single quotes survives</a>" +
      "<a href = \"/spaced\">whitespace around = tolerated</a>" +
      "<a class='x' href='/second-attr'>href not first attribute</a>" +
      "<a href=\"\">empty href kept verbatim (resolver drops it)</a>" +
      "<a name=\"anchor-no-href\">no href, no link</a>" +
      "</body></html>"
    val got = Seq(Tuple1(html)).toDF("html")
      .select(HtmlText.extractLinks(col("html")).as("l")).head.getSeq[String](0)
    assert(got == Seq("it's", "say \"hi\"", "/spaced", "/second-attr", ""),
      s"got $got")
  }

  test("keptBlocks + visibleText expose the block grain; brutal tag soup splits consistently") {
    val soup = "<TABLE><TR><TD>cell one has plenty of characters inside" +
      "</TD><TD>cell two also has plenty of characters</TD></TR></TABLE>" +
      "<P >case-insensitive block tag with attribute soup survives fine</P>"
    val kept = Seq(Tuple1(soup)).toDF("html")
      .select(HtmlText.keptBlocks(col("html")).as("b")).head.getSeq[String](0)
    assert(kept.length == 3, s"two cells + one paragraph: $kept")
  }
}
