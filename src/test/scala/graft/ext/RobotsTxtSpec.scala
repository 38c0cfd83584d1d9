package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for [[RobotsTxt.parseRules]] — grammar corners the q220
  * generator cannot reach (group re-opening, rules before any group,
  * case-sensitive VALUES under case-insensitive directives) plus the
  * end-to-end parity: parsed rules drive
  * [[Urls.applyRobotsRulesFrom]] to the same decisions as the
  * hand-authored tuples in [[Urls.applyRobotsRules]].
  */
class RobotsTxtSpec extends SparkSpec {

  private def rules(txt: String): Seq[(String, Int)] = {
    import spark.implicits._
    Seq(txt).toDF("t").select(RobotsTxt.parseRules(col("t")).as("r"))
      .select(explode(col("r")).as("x"))
      .select(col("x.prefix"), col("x.allow"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
  }

  test("star group rules are kept in order; other groups ignored") {
    assert(rules(
      """User-agent: googlebot
        |Disallow: /g
        |User-agent: *
        |Disallow: /a
        |Allow: /a/pub
        |User-agent: later
        |Disallow: /l""".stripMargin)
      === Seq(("/a", 0), ("/a/pub", 1)))
  }

  test("stacked agent lines share one group; a UA line after rules re-opens") {
    // {* , helper} group → kept; the helper-only group after → ignored;
    // the reopened * group at the end → kept again
    assert(rules(
      """User-agent: *
        |User-agent: helper
        |Disallow: /shared
        |User-agent: helper
        |Disallow: /helper-only
        |User-agent: *
        |Disallow: /again""".stripMargin)
      === Seq(("/shared", 0), ("/again", 0)))
  }

  test("comments, empty values, unknown directives, stray rules, case") {
    assert(rules(
      """Disallow: /stray-before-any-group
        |# full-line comment
        |USER-AGENT: *
        |disallow: /CaseKept # trailing comment
        |Disallow:
        |Allow:
        |Crawl-delay: 10
        |Sitemap: http://x.com/s.xml""".stripMargin)
      === Seq(("/CaseKept", 0)))
    assert(rules("") === Seq.empty)
    assert(rules("# only a comment") === Seq.empty)
  }

  test("CRLF bodies parse identically to LF bodies") {
    val lf = "User-agent: *\nDisallow: /a\nAllow: /b"
    val crlf = lf.replace("\n", "\r\n")
    assert(rules(lf) === rules(crlf))
  }

  test("parsed rules drive applyRobotsRulesFrom to the literal gear's decisions") {
    import spark.implicits._
    val tuples = Seq(
      ("d.com", "/p/", false), ("d.com", "/p/1", true),
      ("t.com", "/x", true), ("t.com", "/x", false),
      // wildcard + anchor: the expression-compiled rx (parseRules) and
      // the Scala-compiled rx (tuple gear) must decide identically
      ("w.com", "/q/*/z$", false))
    val bodies = Seq(
      ("d.com", "User-agent: *\nDisallow: /p/\nAllow: /p/1"),
      ("t.com", "User-agent: *\nAllow: /x\nDisallow: /x"),
      ("w.com", "User-agent: *\nDisallow: /q/*/z$"),
      ("n.com", "User-agent: googlebot\nDisallow: /")).toDF("domain", "txt")
    val table = bodies.select(col("domain"),
      RobotsTxt.parseRules(col("txt")).as("rules"))
    val urls = Seq(
      ("d.com", "/p/0"), ("d.com", "/p/1"), ("d.com", "/q"),
      ("t.com", "/x/y"), ("n.com", "/p"), ("e.com", "/p"),
      ("w.com", "/q/a/z"), ("w.com", "/q/a/zz"))
      .toDF("dom", "path")
    def out(df: org.apache.spark.sql.DataFrame) =
      df.select("dom", "path", "allowed", "matched_len")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getBoolean(2), r.getInt(3))).toSet
    assert(out(Urls.applyRobotsRulesFrom(urls, table, "dom", "path"))
      === out(Urls.applyRobotsRules(urls, tuples, "dom", "path")))
  }
  test("a UTF-8 BOM on the first line does not break the first directive") {
    assert(rules("\uFEFFUser-agent: *\nDisallow: /a\nAllow: /a/pub")
      === Seq(("/a", 0), ("/a/pub", 1)))
  }

  private def sitemaps(txt: String): Seq[String] = {
    import spark.implicits._
    Seq(txt).toDF("t").select(RobotsTxt.parseSitemaps(col("t")).as("s"))
      .selectExpr("explode(s)").as[String].collect().toSeq
  }

  test("parseSitemaps extracts directives anywhere, case-insensitive, comments stripped") {
    val txt = "\uFEFF# header comment\n" +
      "Sitemap: https://a.com/s1.xml\n" +
      "User-agent: *\nDisallow: /p\n" +
      "SITEMAP:https://a.com/s2.xml # mirror\n" + // no space, trailing comment
      "User-agent: other\nDisallow: /\n" +
      "sitemap:   https://a.com/s3.xml  \r\n" + // padding + CRLF
      "Sitemap:\n" + // empty value \u2192 dropped
      "NotASitemap: https://a.com/s4.xml"
    assert(sitemaps(txt) === Seq("https://a.com/s1.xml",
      "https://a.com/s2.xml", "https://a.com/s3.xml"))
  }

  private def delay(txt: String): Option[Double] = {
    import spark.implicits._
    Seq(txt).toDF("t").select(RobotsTxt.parseCrawlDelay(col("t")).as("d"))
      .as[Option[Double]].head()
  }

  test("parseCrawlDelay binds to the star group with rule-line stacking semantics") {
    assert(delay("User-agent: *\nCrawl-delay: 3\nDisallow: /p") === Some(3.0))
    assert(delay("User-agent: *\nDisallow: /p\nCrawl-delay: 2.5") === Some(2.5))
    // other-group delays never leak into *
    assert(delay("User-agent: bot\nCrawl-delay: 9\nUser-agent: *\nDisallow: /x")
      === None)
    // a Crawl-delay line ENDS UA stacking: the UA line after it starts
    // a fresh group, so a star group opened before keeps its delay
    assert(delay("User-agent: *\nCrawl-delay: 4\nUser-agent: b\nCrawl-delay: 7")
      === Some(4.0))
    // stacked UA lines extend the group (no rules seen between them)
    assert(delay("User-agent: a\nUser-agent: *\nCrawl-delay: 6") === Some(6.0))
  }

  test("parseCrawlDelay quarantines malformed values and takes the first valid one") {
    assert(delay("User-agent: *\nDisallow: /p") === None)
    assert(delay("User-agent: *\nCrawl-delay: fast") === None)
    // malformed = absent: a later valid value in the same group wins
    assert(delay("User-agent: *\nCrawl-delay: fast\nCrawl-delay: 2") === Some(2.0))
    // first valid wins over later ones
    assert(delay("User-agent: *\nCrawl-delay: 1\nCrawl-delay: 9") === Some(1.0))
    // comments strip before the value parse
    assert(delay("User-agent: *\nCrawl-delay: 5 # be nice") === Some(5.0))
  }

  test("parsePolicy equals the three single parsers on hostile bodies") {
    import spark.implicits._
    val bodies = Seq(
      "﻿# bom + comment\nSitemap: https://a.com/s.xml\n" +
        "User-agent: *\nDisallow: /a\nCrawl-delay: 2.5\nAllow: /a/pub",
      "User-agent: *\nCrawl-delay: 3\nUser-agent: b\nDisallow: /only-b\n" +
        "sitemap: https://m.com/s.xml # mirror",
      "User-agent: *\nDisallow: /q/*/z$\nCrawl-delay: fast",
      "User-agent: other\nDisallow: /x",
      "User-agent: a\nUser-agent: *\nCrawl-delay: 6\nSitemap:\nSitemap: x")
    val df = bodies.toDF("t").select(
      RobotsTxt.parsePolicy(col("t")).as("p"),
      RobotsTxt.parseRules(col("t")).as("rules1"),
      RobotsTxt.parseCrawlDelay(col("t")).as("delay1"),
      RobotsTxt.parseSitemaps(col("t")).as("sitemaps1"))
    assert(df.filter(
      col("p.rules") =!= col("rules1") ||
        not(col("p.crawl_delay") <=> col("delay1")) ||
        col("p.sitemaps") =!= col("sitemaps1")).count() === 0)
  }

  test("parseSitemaps finds nothing in a directive-free body; parseRules ignores Sitemap lines") {
    assert(sitemaps("User-agent: *\nDisallow: /p") === Seq.empty)
    // the two parsers partition the file: Sitemap lines are rule-inert
    assert(rules("User-agent: *\nSitemap: https://a.com/s.xml\nDisallow: /p")
      === Seq(("/p", 0)))
  }
}
