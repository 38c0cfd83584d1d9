package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for [[Html]] — the extraction-ORDER hazards the q210 oracle
  * sees only end-to-end: script/style bodies must die before tag
  * stripping, entities must decode after it, `&amp;` must decode
  * last, and the link harvest must take anchors only.
  */
class HtmlSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(c).as[String].head()
  }

  test("extractText drops script/style bodies including raw '<' inside them") {
    val html = "<body><p>keep</p><script>if (1 < 2) { x(\"<p>no</p>\"); }" +
      "</script><style>.a { b: c; }</style><p>also</p></body>"
    assert(one(Html.extractText(col("h")), html) === "keep also")
  }

  test("entities decode AFTER tag stripping, &amp; decodes LAST") {
    // &lt;b&gt; is TEXT — decoding before stripping would delete it as
    // a tag; &amp;lt; is the text '&lt;' — decoding &amp; first would
    // double-decode it to '<'
    val html = "<p>a &lt;b&gt; c &amp;lt; d &amp; e&nbsp;f</p>"
    assert(one(Html.extractText(col("h")), html) === "a <b> c &lt; d & e f")
  }

  test("extractText collapses whitespace across stripped tags and newlines") {
    val html = "<div>\n  one\n  <span>two</span>\n\tthree </div>"
    assert(one(Html.extractText(col("h")), html) === "one two three")
  }

  test("extractTitle handles attributes and multiline bodies, empty when absent") {
    assert(one(Html.extractTitle(col("h")),
      "<title lang=\"en\">A\n  &amp; B</title>") === "A & B")
    assert(one(Html.extractTitle(col("h")), "<p>no title</p>") === "")
  }

  test("extractLinks takes anchor hrefs in order, not <link> hrefs") {
    import spark.implicits._
    val html = "<link href=\"skip.css\"><a href=\"first\">1</a>" +
      "<A HREF=\"second\">2</A><a class=\"x\" href=\"third\">3</a>"
    val got = Seq(html).toDF("h")
      .select(Html.extractLinks(col("h"))).as[Seq[String]].head()
    assert(got === Seq("first", "second", "third"))
  }

  test("extractMainText: length and density kills, nested anchors, entities, scripts") {
    def main(html: String): String =
      one(Html.extractMainText(col("h")), html)
    val prose = "This paragraph carries enough plain prose to stay in the corpus."
    // nav (short + saturated) and footer die; prose survives
    assert(main("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      s"<p>$prose</p><footer><a href=\"/c\">Contact</a></footer>") === prose)
    // a LONG but link-saturated block dies by density alone
    val promo = "<div><a href=\"/b\">Buy this today</a> and " +
      "<a href=\"/d\">see all the deals</a> now!</div>"
    assert(main(promo + s"<p>$prose</p>") === prose)
    // an inline link inside long prose does NOT disqualify the block,
    // and NESTED inline tags inside the anchor count once
    val linked = "<p>Long prose around <a href=\"/r\"><b>a bold link</b></a> " +
      "keeps its block well under the density gate.</p>"
    assert(main(linked) ===
      "Long prose around a bold link keeps its block well under the density gate.")
    // script bodies die before scoring; entities decode in block text
    assert(main("<p>Script-free &amp; long enough prose to clear the floor." +
      "<script>var x = \"<a href='/no'>fake</a>\";</script></p>")
      === "Script-free & long enough prose to clear the floor.")
    // kept blocks join in document order; empty page → empty string
    assert(main(s"<p>$prose</p><p>$prose</p>") === s"$prose $prose")
    assert(main("<p>short</p>") === "")
    val e = intercept[IllegalArgumentException](
      Html.extractMainText(col("h"), maxLinkDensityPct = 101))
    assert(e.getMessage.contains("maxLinkDensityPct"))
  }

  test("extractSitemapLocs trims, decodes entities, reads index and urlset alike") {
    import spark.implicits._
    def locs(xml: String): Seq[String] =
      Seq(xml).toDF("h").select(Html.extractSitemapLocs(col("h")))
        .as[Seq[String]].head()
    // urlset entries with padding and the spec-required &amp; escape
    assert(locs("<urlset><url><loc>\n  http://a.com/p?x=1&amp;y=2\n</loc>" +
      "<lastmod>2024-01-01</lastmod></url>" +
      "<url><loc>http://a.com/q</loc></url></urlset>")
      === Seq("http://a.com/p?x=1&y=2", "http://a.com/q"))
    // a sitemap INDEX lists child sitemaps through the same element
    assert(locs("<sitemapindex><sitemap><loc>http://a.com/s1.xml</loc>" +
      "</sitemap></sitemapindex>") === Seq("http://a.com/s1.xml"))
    assert(locs("<urlset></urlset>") === Seq.empty)
  }

  test("extractLinks harvests all three quoting forms against hostile soup") {
    import spark.implicits._
    def links(html: String): Seq[String] =
      Seq(html).toDF("h").select(Html.extractLinks(col("h")))
        .as[Seq[String]].head()
    // r14 verdict gap #5: real tag soup mixes double-quoted,
    // single-quoted, and unquoted hrefs — one alternation keeps
    // document order across the forms
    assert(links("<a href=\"d\">1</a><a href='s'>2</a><a href=u>3</a>")
      === Seq("d", "s", "u"))
    // quotes of the OTHER kind are data inside a quoted value
    assert(links("<a href=\"it's\">1</a><a href='say \"hi\"'>2</a>")
      === Seq("it's", "say \"hi\""))
    // unquoted values end at whitespace or '>'; empty quoted hrefs
    // stay (an explicit self-link target), spaces around '=' are legal
    assert(links("<a href=/p/1 class=x>1</a><a href=\"\">2</a>" +
      "<a href = 'spaced'>3</a>") === Seq("/p/1", "", "spaced"))
    // a multiline tag and an href-less anchor
    assert(links("<a\n  class=\"y\"\n  href=\"ml\">1</a><a name=\"n\">2</a>")
      === Seq("ml"))
  }
  private def oneOpt(c: org.apache.spark.sql.Column, html: String): Option[String] = {
    import spark.implicits._
    Seq(html).toDF("h").select(c).as[Option[String]].head()
  }

  test("extractMetaContent handles both attribute orders, quoting forms, property keys") {
    val desc = Html.extractMetaContent(col("h"), "description")
    assert(oneOpt(desc,
      "<head><meta name=\"description\" content=\"A &amp; B\"></head>")
      === Some("A & B"))
    // content BEFORE name, single quotes, unquoted name value
    assert(oneOpt(desc, "<meta content='C  D' name=description>")
      === Some("C D")) // whitespace collapses
    // property= keying (OpenGraph)
    assert(oneOpt(Html.extractMetaContent(col("h"), "og:url"),
      "<meta property=\"og:url\" content=\"https://x.com/p\">")
      === Some("https://x.com/p"))
    // absent key → NULL; a DIFFERENT meta must not leak
    assert(oneOpt(desc, "<meta name=\"keywords\" content=\"nope\">") === None)
    // the name/content pair must share ONE tag — a keywords tag
    // followed by a bare content tag must not stitch across '>'
    assert(oneOpt(desc,
      "<meta name=\"description\"><meta content=\"orphan\">") === None)
  }

  test("extractCanonicalHref handles attribute orders and quoting; absent is NULL") {
    val c = Html.extractCanonicalHref(col("h"))
    assert(oneOpt(c, "<link rel=\"canonical\" href=\"http://x.com/p\">")
      === Some("http://x.com/p"))
    assert(oneOpt(c, "<link href='http://y.com/q' rel=canonical>")
      === Some("http://y.com/q"))
    assert(oneOpt(c, "<link rel=canonical href=/rooted>") === Some("/rooted"))
    assert(oneOpt(c, "<link rel=\"stylesheet\" href=\"s.css\">") === None)
    assert(oneOpt(c, "no links here") === None)
  }

  test("extractAnchors pairs hrefs with visible text; unclosed anchors skip") {
    import spark.implicits._
    val html = "<body><a href=\"/p\">Go <b>now</b> &amp; read</a>" +
      "<a href='q'>  spaced\n text </a>" +
      "<a href=unq>U</a>" +
      // unclosed anchor FOLLOWED by a real one: the temper keeps it
      // from swallowing the next anchor and claiming its </a>
      "<a href=\"/noclose\">dangling <a href=\"/after\">A</a>" +
      "<script>var s = '<a href=\"/fake\">code</a>';</script></body>"
    val got = Seq(html).toDF("h")
      .select(explode(Html.extractAnchors(col("h"))).as("a"))
      .select("a.href", "a.text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("/p", "Go now & read"), ("q", "spaced text"),
      ("unq", "U"), ("/after", "A")))
  }

  test("extractJsonLd takes the typed block, skips plain scripts, NULL when absent") {
    import spark.implicits._
    val html = "<script>var x = 1;</script>" +
      "<script async type='application/ld+json'>\n {\"@type\":\"Article\"} \n</script>" +
      "<script type=\"application/ld+json\">{\"second\":true}</script>"
    val got = Seq(html).toDF("h")
      .select(Html.extractJsonLd(col("h"))).as[String].head()
    assert(got === "{\"@type\":\"Article\"}")
    val absent = Seq("<script>not typed</script>").toDF("h")
      .select(Html.extractJsonLd(col("h"))).collect().head
    assert(absent.isNullAt(0))
  }

  test("extractJsonLd: data-type / src-query 'type=' never counts as the attribute") {
    import spark.implicits._
    // a false hit on data-type would return JS and SHADOW the real
    // ld+json block later in the page
    val html = "<script data-type=\"application/ld+json\">var js = 1;</script>" +
      "<script src=\"/x?type=application/ld+json\"></script>" +
      "<script type=\"application/ld+json\">{\"@type\":\"Product\"}</script>"
    val got = Seq(html).toDF("h")
      .select(Html.extractJsonLd(col("h"))).as[String].head()
    assert(got === "{\"@type\":\"Product\"}")
    val onlyFakes = Seq("<script data-type=\"application/ld+json\">var js;" +
      "</script>").toDF("h")
      .select(Html.extractJsonLd(col("h"))).collect().head
    assert(onlyFakes.isNullAt(0))
  }

  test("parseJsonLdEntity: single object, entity array takes FIRST, malformed is NULL") {
    import spark.implicits._
    def fields(raw: String): (String, String, String) = {
      val e = Html.parseJsonLdEntity(col("r"))
      Seq(raw).toDF("r").select(
        e.getField("@type"), e.getField("headline"),
        e.getField("offers").getField("price"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .head
    }
    assert(fields("{\"@type\":\"Article\",\"headline\":\"H\"}") ===
      (("Article", "H", null)))
    // array form: first entity wins; the second entity's fields must
    // NOT leak through
    assert(fields("[{\"@type\":\"Article\",\"headline\":\"A1\"}," +
      "{\"@type\":\"Product\",\"offers\":{\"price\":\"9\"}}]") ===
      (("Article", "A1", null)))
    // malformed JSON quarantines to NULL fields, never throws
    assert(fields("{\"@type\":\"Article\",\"headline\":\"trunc") ===
      ((null, null, null)))
    // EMPTY entity array ('[]', which real sites emit) quarantines to
    // NULL — an unguarded element_at(_, 1) throws under ANSI mode
    assert(fields("[]") === ((null, null, null)))
    assert(fields(" \n[ ]") === ((null, null, null)))
    // ARRAY-VALUED @type folds to its first name (publisher-primary),
    // never the raw JSON text the permissive parser would emit
    assert(fields("{\"@type\":[\"Article\",\"NewsArticle\"],\"headline\":\"H\"}") ===
      (("Article", "H", null)))
    assert(fields("[{\"@type\":[\"Product\"],\"offers\":{\"price\":\"7\"}}]") ===
      (("Product", null, "7")))
    // an EMPTY @type array quarantines the field, keeps the rest
    assert(fields("{\"@type\":[],\"headline\":\"K\"}") === ((null, "K", null)))
  }

  test("robotsDirectives unions meta and header; 'none' means both; case-folds") {
    import spark.implicits._
    def dirs(meta: String, header: String): (Boolean, Boolean) = {
      val d = Html.robotsDirectives(col("m"), col("h"))
      Seq((Option(meta), Option(header))).toDF("m", "h")
        .select(d.getField("noindex"), d.getField("nofollow"))
        .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).head
    }
    assert(dirs(null, null) === ((false, false)))
    assert(dirs("noindex, nofollow", null) === ((true, true)))
    assert(dirs(" NOFOLLOW ", "noindex") === ((true, true)))
    assert(dirs("none", null) === ((true, true)))
    assert(dirs("index, follow", null) === ((false, false)))
    // 'noindexing' is not the token 'noindex'
    assert(dirs("noindexing", null) === ((false, false)))
  }

  test("extractRobotsMetaAll unions every robots meta tag, both attr orders") {
    import spark.implicits._
    val html = "<meta name=\"robots\" content=\"index\">" +
      "<meta content='noindex' name=robots>" +
      "<meta name=\"description\" content=\"not robots\">"
    val got = Seq(html).toDF("h")
      .select(Html.extractRobotsMetaAll(col("h"))).as[String].head()
    assert(got === "index,noindex")
    // the union through robotsDirectives: the second tag's noindex wins
    val d = Seq(html).toDF("h").select(
      Html.robotsDirectives(Html.extractRobotsMetaAll(col("h")),
        lit(null).cast("string")).getField("noindex")).as[Boolean].head()
    assert(d)
    val none = Seq("<p>no meta</p>").toDF("h")
      .select(Html.extractRobotsMetaAll(col("h"))).collect().head
    assert(none.isNullAt(0))
    // UNQUOTED content value — a declared restriction that the
    // quoted-only patterns silently dropped; both attribute orders
    val unq = Seq("<meta name=robots content=noindex>" +
      "<meta content=nofollow name=robots>").toDF("h")
      .select(Html.extractRobotsMetaAll(col("h"))).as[String].head()
    assert(unq === "noindex,nofollow")
  }

  test("relHasToken matches rel TOKENS, never substrings; anchors carry rel") {
    import spark.implicits._
    val html = "<a rel=\"ugc nofollow\" href=\"/b\">B</a>" +
      "<a rel=\"nofollowish\" href=\"/c\">C</a><a href=\"/d\">D</a>"
    val got = Seq(html).toDF("h")
      .select(explode(Html.extractAnchors(col("h"))).as("a"))
      .select(col("a.href"), Html.relHasToken(col("a.rel"), "nofollow"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(got === Seq(("/b", true), ("/c", false), ("/d", false)))
  }

  test("extractFeedEntries scopes to item/entry blocks, honors rel, unwraps CDATA") {
    import spark.implicits._
    val rss = "<rss><channel><link>http://site.com/</link>" +
      "<item><title><![CDATA[T & one]]></title><link>http://site.com/1</link></item>" +
      "<item><title>No link here</title></item></rss>"
    val atom = "<feed><link rel=\"self\" href=\"http://f.org/feed\"/>" +
      "<entry><title>E</title><link rel=\"self\" href=\"/skip\"/>" +
      "<link href=\"/keep\" type=\"text/html\"/></entry></feed>"
    def entries(xml: String): Seq[(String, String)] =
      Seq(xml).toDF("x")
        .select(explode(Html.extractFeedEntries(col("x"))).as("e"))
        .select("e.url", "e.title")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // channel-level link never harvested; link-less item skipped;
    // CDATA title unwrapped and entity-decoded
    assert(entries(rss) === Seq(("http://site.com/1", "T & one")))
    // feed-level self link out of scope; in-entry self link skipped
    // even though it comes FIRST; trailing attributes tolerated
    assert(entries(atom) === Seq(("/keep", "E")))
  }

  test("extractMetaRefresh: delay/url forms, quoted targets, malformed delay") {
    import spark.implicits._
    def parse(html: String): (Option[Long], Option[String]) = {
      val r = Html.extractMetaRefresh(col("h"))
      val row = Seq(html).toDF("h")
        .select(r.getField("delay"), r.getField("url")).head()
      (if (row.isNullAt(0)) None else Some(row.getLong(0)),
        Option(row.getString(1)))
    }
    assert(parse("<meta http-equiv=\"refresh\" content=\"0; url=/n\">") ===
      ((Some(0L), Some("/n"))))
    assert(parse("<meta http-equiv=refresh content=\"5;URL='http://x/y'\">") ===
      ((Some(5L), Some("http://x/y"))))
    // pure reload: delay only
    assert(parse("<meta http-equiv=\"refresh\" content=\"30\">") ===
      ((Some(30L), None)))
    // malformed delay keeps the live target
    assert(parse("<meta http-equiv=\"refresh\" content=\"soon; url=/x\">") ===
      ((None, Some("/x"))))
    assert(parse("<p>none</p>") === ((None, None)))
  }

  test("extractBaseHref: first base wins; extractHreflangAlternates scopes to rel=alternate") {
    import spark.implicits._
    val base = Seq("<base target=\"_b\" href=\"/one/\"><base href=\"/two/\">")
      .toDF("h").select(Html.extractBaseHref(col("h"))).as[String].head()
    assert(base === "/one/")
    val html = "<link rel=\"stylesheet\" href=\"/s.css\">" +
      "<link rel=\"alternate\" href=\"/feed\">" +
      "<link rel=\"alternate\" hreflang=\"EN\" href=\"/en\">" +
      "<link hreflang=\"x-default\" rel=alternate href='/p'>"
    val got = Seq(html).toDF("h")
      .select(explode(Html.extractHreflangAlternates(col("h"))).as("a"))
      .select("a.lang", "a.href")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // stylesheet never matches; alternate without hreflang filtered;
    // lang case-folds; both attribute orders accepted
    assert(got === Seq(("en", "/en"), ("x-default", "/p")))
  }

  test("toMarkdown: headings, emphasis, links, lists; transform order pinned") {
    import spark.implicits._
    val html = "<html><head><title>T</title>" +
      "<script>var x = '<b>no</b>';</script></head><body>" +
      "<h2>Title &amp; more</h2>" +
      "<p>Intro <b>bold</b> and <em>soft</em> text.</p>" +
      "<ul><li>first</li><li>see <a href=\"/p\"><strong>link</strong></a></li></ul>" +
      "<p>code <code>x=1</code>&nbsp;done</p></body></html>"
    val got = Seq(html).toDF("h")
      .select(Html.toMarkdown(col("h"))).as[String].head()
    assert(got ===
      "T\n\n## Title & more\n\nIntro **bold** and *soft* text.\n\n" +
        "- first\n- see [**link**](/p)\n\ncode `x=1` done")
    // inline marks INSIDE anchor text rewrite before the anchor wraps;
    // literal &lt;b&gt; in prose decodes AFTER tag handling and stays text
    val lit2 = Seq("<p>a &lt;b&gt; c</p>").toDF("h")
      .select(Html.toMarkdown(col("h"))).as[String].head()
    assert(lit2 === "a <b> c")
    // single-quoted and unquoted hrefs; h1 and h3 levels; br
    val more = Seq("<h1>One</h1><h3>Three</h3>line1<br>line2 " +
      "<a href='/q'>q</a> <a href=/r>r</a>").toDF("h")
      .select(Html.toMarkdown(col("h"))).as[String].head()
    assert(more === "# One\n\n### Three\n\nline1\nline2 [q](/q) [r](/r)")
  }

  test("toMarkdown: ol numbering, nested-list indent, blockquotes, images (r18)") {
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMarkdown(col("h"))).as[String].head()
    // ordered lists number position-aware within the list scope; a
    // sibling ul keeps bullets and a second ol restarts at 1
    assert(md("<ol><li>alpha</li><li>beta</li><li>gamma</li></ol>" +
      "<ul><li>dot</li></ul><ol><li>re</li></ol>") ===
      "1. alpha\n2. beta\n3. gamma\n\n- dot\n\n1. re")
    // nested lists indent two spaces per level; the inner ol numbers
    // independently of the outer ul
    assert(md("<ul><li>a<ol><li>a1</li><li>a2</li></ol></li><li>b</li></ul>") ===
      "- a\n  1. a1\n  2. a2\n- b")
    // three levels of nesting — the documented indent cap
    assert(md("<ul><li>x<ul><li>y<ul><li>z</li></ul></li></ul></li></ul>") ===
      "- x\n  - y\n    - z")
    // blockquote prefixes every line; paragraph breaks inside fold to
    // quoted line breaks; two quote levels nest
    assert(md("<p>pre</p><blockquote><p>one</p><p>two</p></blockquote><p>post</p>") ===
      "pre\n\n> one\n> two\n\npost")
    assert(md("<blockquote>outer<blockquote>inner</blockquote></blockquote>") ===
      "> outer\n> > inner")
    // a list inside a blockquote keeps its bullets, quoted
    assert(md("<blockquote><ul><li>q1</li><li>q2</li></ul></blockquote>") ===
      "> - q1\n> - q2")
    // images render ![alt](src) in any attribute order/quoting; a
    // linked image is the badge form; src-less imgs drop
    assert(md("<p><img src=\"/a.png\" alt=\"pic\"></p>") === "![pic](/a.png)")
    assert(md("<p><img alt='p2' src=/b.jpg /></p>") === "![p2](/b.jpg)")
    assert(md("<p><a href=\"/u\"><img src=\"/x.png\" alt=\"badge\"></a></p>") ===
      "[![badge](/x.png)](/u)")
    assert(md("<p>an <img alt=\"lost\"> image</p>") === "an image")
    // orphan <li> outside any list container still gets a bullet
    assert(md("<li>stray</li>") === "- stray")
    // HTML makes </li> OPTIONAL and real soup omits it constantly —
    // close-less items still render (r18 fresh-eyes: requiring the
    // close would silently drop the text), mixed forms too
    assert(md("<ul><li>a<li>b</ul>") === "- a\n- b")
    assert(md("<ol><li>one</li><li>two<li>three</ol>") ===
      "1. one\n2. two\n3. three")
  }

  test("toMarkdown: pre fences keep exact whitespace, hr rules, GFM tables (r18)") {
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMarkdown(col("h"))).as[String].head()
    // pre → fenced block: internal double spaces, tabs, newlines and
    // blank lines survive the collapse; entities decode ONCE; the
    // <code> wrapper strips without inserting a space
    assert(md("<p>before</p><pre><code>if (a &lt; b) {\n\tx  =  1;\n\n}</code></pre><p>after</p>") ===
      "before\n\n```\nif (a < b) {\n\tx  =  1;\n\n}\n```\n\nafter")
    // a raw unescaped '<' inside pre cannot arm the downstream tag
    // strip (it would otherwise eat to the next '>' anywhere)
    assert(md("<pre>a < b</pre><p>kept</p>") === "```\na < b\n```\n\nkept")
    // hr → thematic break
    assert(md("<p>one</p><hr><p>two</p>") === "one\n\n---\n\ntwo")
    // table → GFM: header row + separator + data rows; inline marks
    // in cells survive (inline passes ran first); entities decode once
    assert(md("<table><tr><th>Part</th><th>Qty &amp; u</th></tr>" +
      "<tr><td><b>w</b></td><td>3 kg</td></tr></table>") ===
      "| Part | Qty & u |\n| --- | --- |\n| **w** | 3 kg |")
    // header-less table: data rows only; colspan expands; pipes escape
    assert(md("<table><tr><td colspan=2>a</td><td>x|y</td></tr></table>") ===
      "| a | a | x\\|y |")
  }

  test("extractTableGrids: caption text, absent caption empty (r18)") {
    import spark.implicits._
    val got = Seq("<table><caption>Spec &amp; sizes</caption>" +
      "<tr><td>a</td></tr></table><table><tr><td>b</td></tr></table>")
      .toDF("h")
      .select(Html.extractTableGrids(col("h")).as("g"))
      .select(transform(col("g"), t => t.getField("caption")).as("caps"))
      .as[Seq[String]].head()
    assert(got === Seq("Spec & sizes", ""))
  }

  test("toMarkdown degradations pinned: same-tag nesting flattens; code decodes") {
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMarkdown(col("h"))).as[String].head()
    // same-tag nesting: the non-greedy match closes at the INNER tag
    // (r17 ADVICE, documented) — `<b>a <b>c</b> d</b>` flattens
    assert(md("<p><b>a <b>c</b> d</b></p>") === "**a c** d")
    // entity decode applies inside code spans: Markdown code shows its
    // characters literally, so the decoded form is the faithful one
    assert(md("<p><code>&lt;b&gt;</code></p>") === "`<b>`")
    // nesting deeper than three list levels flattens into the third
    assert(md("<ul><li>1<ul><li>2<ul><li>3<ul><li>4</li></ul></li></ul></li></ul></li></ul>")
      .linesIterator.size === 4)
  }

  test("extractTables: th+td cells, inline tags strip, entities decode, no-table empty") {
    import spark.implicits._
    val html = "<p>before</p><table class=\"x\">" +
      "<tr><th>Name</th><th>Qty &amp; Unit</th></tr>" +
      "<tr><td><b>widget</b></td><td> 3 kg </td></tr></table>" +
      "<table><tr><td>solo</td></tr></table>"
    val got = Seq(html).toDF("h")
      .select(Html.extractTables(col("h")).as("t"))
      .as[Seq[Seq[Seq[String]]]].head()
    assert(got === Seq(
      Seq(Seq("Name", "Qty & Unit"), Seq("widget", "3 kg")),
      Seq(Seq("solo"))))
    val none = Seq("<p>no tables</p>").toDF("h")
      .select(Html.extractTables(col("h")).as("t"))
      .as[Seq[Seq[Seq[String]]]].head()
    assert(none === Seq.empty)
    // a cell containing '|' survives VERBATIM in the array output —
    // the '|'-join in the q277/q279 gates is the GATE's row encoding,
    // not the operator's contract (r17 verdict fresh-eyes pin)
    val pipe = Seq("<table><tr><td>a|b</td><td>c</td></tr></table>")
      .toDF("h").select(Html.extractTables(col("h")).as("t"))
      .as[Seq[Seq[Seq[String]]]].head()
    assert(pipe === Seq(Seq(Seq("a|b", "c"))))
  }

  test("extractTableGrids: colspan/rowspan expansion, ragged pad, header flags (r18)") {
    import spark.implicits._
    def grids(h: String): Seq[(Seq[Seq[String]], Seq[Boolean])] =
      Seq(h).toDF("h").select(Html.extractTableGrids(col("h")).as("g"))
        .as[Seq[(Seq[Seq[String]], Seq[Boolean], String)]].head()
        .map(t => (t._1, t._2))
    // colspan duplicates across columns; rowspan re-occupies the column
    // in the next row and the next row's cells shift past it; the short
    // last row pads to the table width; th row flags as header
    val html = "<table>" +
      "<tr><th colspan=2>Spec</th><th>Unit</th></tr>" +
      "<tr><td rowspan=\"2\">widget</td><td>3</td><td>kg</td></tr>" +
      "<tr><td>4</td><td>kg</td></tr>" +
      "<tr><td>loose</td></tr></table>"
    val Seq((grid, hdr)) = grids(html)
    assert(grid === Seq(
      Seq("Spec", "Spec", "Unit"),
      Seq("widget", "3", "kg"),
      Seq("widget", "4", "kg"),
      Seq("loose", "", "")))
    assert(hdr === Seq(true, false, false, false))
    // rowspan=0 spans to the end of the table (HTML5 form)
    val Seq((g0, _)) = grids("<table>" +
      "<tr><td rowspan=0>all</td><td>a</td></tr>" +
      "<tr><td>b</td></tr><tr><td>c</td></tr></table>")
    assert(g0 === Seq(Seq("all", "a"), Seq("all", "b"), Seq("all", "c")))
    // junk colspan clamps (64 cap) instead of exploding the row
    val Seq((gBig, _)) = grids(
      "<table><tr><td colspan=9999>x</td></tr></table>")
    assert(gBig.head.size === 64)
    // mixed th/td row is NOT a header row; entities decode per cell
    val Seq((gMix, hMix)) = grids("<table><tr><th>k</th>" +
      "<td>v &amp; w</td></tr></table>")
    assert(gMix === Seq(Seq("k", "v & w")) && hMix === Seq(false))
    // no tables → empty; a cell-less row contributes an all-pad row
    assert(grids("<p>none</p>") === Seq.empty)
  }

  test("extractSitemapEntries: per-url metadata, NULL absents, try_cast priority") {
    import spark.implicits._
    val xml = "<urlset><url><loc>http://a/</loc><lastmod>2024-01-01</lastmod>" +
      "<changefreq>daily</changefreq><priority>0.8</priority></url>" +
      "<url><loc>http://b/?x=1&amp;y=2</loc><priority>high</priority></url></urlset>"
    val got = Seq(xml).toDF("x")
      .select(explode(Html.extractSitemapEntries(col("x"))).as("e"))
      .select("e.loc", "e.lastmod", "e.changefreq", "e.priority")
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got === Seq(
      ("http://a/", Some("2024-01-01"), Some("daily"), Some(0.8)),
      ("http://b/?x=1&y=2", None, None, None)))
  }

  test("toMarkdown: definition lists render Markdown-Extra term/: lines (r18)") {
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMarkdown(col("h"))).as[String].head()
    // closed and close-less forms mix (the spec makes </dt>/</dd>
    // optional); consecutive <dd> each get their own ': ' line
    val html = "<p>intro</p><dl><dt>Term A</dt><dd>def one</dd>" +
      "<dd>def two</dd><dt>Term <b>B</b><dd>def three</dl><p>tail</p>"
    assert(md(html) ===
      "intro\n\nTerm A\n: def one\n: def two\n\nTerm **B**\n: def three\n\ntail")
    // dd-only and empty dl degrade without fabricating terms
    assert(md("<dl><dd>orphan</dd></dl>") === ": orphan")
    assert(md("<p>a</p><dl></dl><p>b</p>") === "a\n\nb")
    // block p/br inside a definition fold to its line — a paragraph
    // break would split the ': ' prefix from its text
    assert(md("<dl><dt>t</dt><dd><p>one</p><p>two</p></dd></dl>") ===
      "t\n: one two")
  }

  test("toMarkdown: fence info string from language-/lang- class (r18)") {
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMarkdown(col("h"))).as[String].head()
    // the highlight.js/Prism convention, on the inner <code>
    assert(md("<pre><code class=\"language-python\">x = 1</code></pre>") ===
      "```python\nx = 1\n```")
    // the short lang- form, on the <pre> itself, case-folds
    assert(md("<pre class='lang-JS'>f()</pre>") === "```js\nf()\n```")
    // 'clang-format' must NOT match (word boundary before 'lang');
    // class-less blocks keep the bare fence
    assert(md("<pre class=\"clang-format\">y</pre>") === "```\ny\n```")
    assert(md("<pre>z</pre>") === "```\nz\n```")
    // the class-value scan must not escape the attribute: an UNQUOTED
    // class followed by a lang-bearing OTHER attribute stays bare
    assert(md("<pre class=x id=lang-y>w</pre>") === "```\nw\n```")
    // multi-class value: the language token is found mid-list
    assert(md("<pre><code class=\"hl language-go s\">g()</code></pre>") ===
      "```go\ng()\n```")
    // attribute names case-fold like the values: an all-caps CLASS
    // must not skip the harvest (the contains-probe folds too)
    assert(md("<pre><code CLASS=\"LANGUAGE-RUST\">r()</code></pre>") ===
      "```rust\nr()\n```")
  }

  test("extractTableGrids: thead/tfoot row groups reorder to render order (r18)") {
    import spark.implicits._
    def grids(h: String): Seq[(Seq[Seq[String]], Seq[Boolean])] =
      Seq(h).toDF("h").select(Html.extractTableGrids(col("h")).as("g"))
        .as[Seq[(Seq[Seq[String]], Seq[Boolean], String)]].head()
        .map(t => (t._1, t._2))
    // the spec-legal streaming form: tfoot written FIRST renders last
    val streaming = "<table><tfoot><tr><td>total</td></tr></tfoot>" +
      "<thead><tr><th>h</th></tr></thead>" +
      "<tbody><tr><td>a</td></tr></tbody></table>"
    val Seq((g1, h1)) = grids(streaming)
    assert(g1 === Seq(Seq("h"), Seq("a"), Seq("total")))
    assert(h1 === Seq(true, false, false))
    // close-less sections (</thead>/</tfoot> optional) end at the
    // next row-group open or the table end
    val closeless = "<table><thead><tr><th>h</th></tr>" +
      "<tbody><tr><td>a</td></tr><tfoot><tr><td>t</td></tr></table>"
    val Seq((g2, _)) = grids(closeless)
    assert(g2 === Seq(Seq("h"), Seq("a"), Seq("t")))
    // the source-position HARVEST keeps source order — its documented
    // contract is where cells sit in the bytes, not render order
    val harvest = Seq(streaming).toDF("h")
      .select(Html.extractTables(col("h")).as("t"))
      .as[Seq[Seq[Seq[String]]]].head()
    assert(harvest === Seq(Seq(Seq("total"), Seq("h"), Seq("a"))))
    // GFM rendering rides the reorder: the thead row reaches row 1 and
    // emits the separator even when tfoot leads the source
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMarkdown(col("h"))).as[String].head()
    assert(md(streaming) === "| h |\n| --- |\n| a |\n| total |")
  }

  test("toMarkdown: strikethrough, code-span padding, fence escalation, captions (r18)") {
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMarkdown(col("h"))).as[String].head()
    // GFM strikethrough, all three tag spellings
    assert(md("<p>a <del>b</del> <s>c</s> <strike>d</strike></p>") ===
      "a ~~b~~ ~~c~~ ~~d~~")
    // a code-span body carrying a backtick takes the CommonMark
    // longer-delimiter + space-padding form; backtick-free bodies keep
    // the bare single-backtick wrap
    assert(md("<p>run <code>a ` b</code> now</p>") === "run `` a ` b `` now")
    assert(md("<p>run <code>ls</code> now</p>") === "run `ls` now")
    // double-backtick body escalates to a triple delimiter
    assert(md("<p><code>x `` y</code></p>") === "``` x `` y ```")
    // a fenced body containing a ``` run escalates the fence to 4
    // backticks (CommonMark: a body line opening with the fence string
    // would close it early); fence-safe bodies keep ```
    assert(md("<pre>code\n```\nmore</pre>") === "````\ncode\n```\nmore\n````")
    // the <caption> renders as a plain paragraph above the rows (its
    // text used to vanish with the tag strip); caption-less tables are
    // unchanged
    assert(md("<table><caption>Spec &amp; caps</caption>" +
      "<tr><th>h</th></tr><tr><td>a</td></tr></table>") ===
      "Spec & caps\n\n| h |\n| --- |\n| a |")
    assert(md("<table><tr><td>a</td></tr></table>") === "| a |")
  }

  test("toMarkdown: <ol start> resumes numbering; data-start never matches (r18)") {
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMarkdown(col("h"))).as[String].head()
    // both quoting forms; numbering continues from start
    assert(md("<ol start=\"4\"><li>a</li><li>b</li></ol>") === "4. a\n5. b")
    assert(md("<ol class=x start=10><li>p</li><li>q</li></ol>") ===
      "10. p\n11. q")
    // data-start is NOT the start attribute (whitespace-preceded rule);
    // garbage values fall back to 1
    assert(md("<ol data-start=7><li>a</li><li>b</li></ol>") === "1. a\n2. b")
    assert(md("<ol start=x><li>a</li></ol>") === "1. a")
    // an inner ol's own start is honored through the nesting passes
    assert(md("<ul><li>o<ol start=3><li>i</li><li>j</li></ol></li></ul>") ===
      "- o\n  3. i\n  4. j")
  }

  test("extractTableGrids: rowspan clips at its row-group boundary (r18)") {
    import spark.implicits._
    def grids(h: String): Seq[(Seq[Seq[String]], Seq[Boolean])] =
      Seq(h).toDF("h").select(Html.extractTableGrids(col("h")).as("g"))
        .as[Seq[(Seq[Seq[String]], Seq[Boolean], String)]].head()
        .map(t => (t._1, t._2))
    // a tbody span larger than its group CLIPS at the group end: the
    // tfoot row lays out from column 0, un-shifted and un-filled
    val overSpan = "<table><thead><tr><th>h1</th><th>h2</th></tr></thead>" +
      "<tbody><tr><td rowspan=9>span</td><td>a</td></tr>" +
      "<tr><td>b</td></tr></tbody>" +
      "<tfoot><tr><td>f1</td><td>f2</td></tr></tfoot></table>"
    val Seq((g1, _)) = grids(overSpan)
    assert(g1 === Seq(Seq("h1", "h2"), Seq("span", "a"), Seq("span", "b"),
      Seq("f1", "f2")))
    // rowspan=0 is "to the end of the ROW GROUP" (HTML spec): it fills
    // the rest of its tbody and stops there
    val zeroSpan = "<table><tbody><tr><td rowspan=0>z</td><td>a</td></tr>" +
      "<tr><td>b</td></tr></tbody>" +
      "<tfoot><tr><td>f</td></tr></tfoot></table>"
    val Seq((g2, _)) = grids(zeroSpan)
    assert(g2 === Seq(Seq("z", "a"), Seq("z", "b"), Seq("f", "")))
    // section-free tables are one group: spans fill as before
    val plain = "<table><tr><td rowspan=2>s</td><td>a</td></tr>" +
      "<tr><td>b</td></tr></table>"
    val Seq((g3, _)) = grids(plain)
    assert(g3 === Seq(Seq("s", "a"), Seq("s", "b")))
  }

  test("toMainMarkdown strips chrome with bodies; title never leaks (r18)") {
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(Html.toMainMarkdown(col("h"))).as[String].head()
    val page = "<html><head><title>SEO Title | Site</title>" +
      "<meta name=d content=x></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">X</a></nav>" +
      "<header><h1>Site banner</h1></header>" +
      "<h1>Real heading</h1><p>Real prose with <b>marks</b>.</p>" +
      "<ul><li>kept a</li><li>kept b</li></ul>" +
      "<aside>Promo box</aside>" +
      "<form><input name=q><button>Go</button></form>" +
      "<footer>© 2024 Site</footer></body></html>"
    assert(md(page) ===
      "# Real heading\n\nReal prose with **marks**.\n\n- kept a\n- kept b")
    // plain toMarkdown (no chrome strip) LEAKS the title text — the
    // two operators are deliberately different contracts
    val plain = Seq(page).toDF("h")
      .select(Html.toMarkdown(col("h"))).as[String].head()
    assert(plain.contains("SEO Title"))
    // nested same tags: only the INNER block strips (the tempered
    // match cannot cross the nested open); the outer block's own text
    // degrades to prose rather than vanishing — documented
    assert(md("<body><header>a<header>b</header>c</header><p>x</p></body>")
      === "a c\n\nx")
    // a close-less chrome block keeps its content — never eats to EOF
    assert(md("<body><nav>menu<p>prose tail</p></body>") ===
      "menu\n\nprose tail")
  }

  test("extractMainText splits on block tags whose attributes span newlines") {
    import spark.implicits._
    // real tag soup line-wraps inside tags: <div\nclass=...> must still
    // bound a block (and its closing tag may wrap too)
    val html = "<div\n  class=\"nav\"><a href=\"/\">Home</a> <a href=\"/x\">X</a></div\n>" +
      "<p\n id=\"m\">This prose paragraph easily clears the length floor intact.</p>"
    val got = Seq(html).toDF("h")
      .select(Html.extractMainText(col("h"))).as[String].head()
    assert(got === "This prose paragraph easily clears the length floor intact.")
  }
}
