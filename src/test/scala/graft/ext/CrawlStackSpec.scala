package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end composition of the round-14 crawl components — each is
  * gate-tested alone (q207–q213); this spec pins that they CHAIN the
  * way a pipeline uses them: WARC blobs → [[Warc]] records →
  * [[Html]] link harvest → [[Urls]] canonicalization → robots
  * filtering → frontier dedup → per-domain cap, on a handcrafted
  * corpus small enough to assert the surviving fetch list exactly.
  */
class CrawlStackSpec extends SparkSpec {

  private def warcBlob(uri: String, html: String): Array[Byte] = {
    val payload = html.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
      payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  test("WARC → extract → canonicalize → robots → frontier → cap") {
    import spark.implicits._
    val pages = Seq(
      (1L, warcBlob("http://seed.com/a",
        """<html><body><a href="HTTP://WWW.Shop.COM:80/item/1/?utm_source=m">x</a>
          |<a href="http://shop.com/item/1?utm_campaign=n">dup of 1</a>
          |<a href="https://shop.com/admin/panel">blocked</a>
          |<a href="http://shop.com/item/2">y</a>
          |<a href="http://news.org/story/9#frag">z</a></body></html>""".stripMargin)),
      (2L, warcBlob("http://seed.com/b",
        """<html><body><a href="http://shop.com/item/3">w</a>
          |<script>var s = "<a href=\"http://fake.com/no\">";</script>
          |</body></html>""".stripMargin)))
      .toDF("doc_id", "blob")

    val records = Warc.parseWarcColumn(pages, "doc_id", "blob")
    val links = records
      .select(col("doc_id"), col("payload").cast("string").as("html"))
      .select(col("doc_id"), explode(Html.extractLinks(col("html"))).as("href"))
      .withColumn("curl", Urls.canonicalizeUrl(col("href")))
      .withColumn("dom", Urls.registeredDomain(Urls.hostOf(col("curl"))))
      .withColumn("path", Urls.pathOf(col("curl")))

    // the script-embedded fake anchor must not be harvested: the whole
    // <script> body is opaque — its quoted markup never parses
    assert(links.filter(col("curl").contains("fake.com")).count() === 0)

    val allowed = Urls.applyRobotsRules(links,
        Seq(("shop.com", "/admin", false)), "dom", "path")
      .filter(col("allowed"))
    // frontier dedup on the CANONICAL url: the two spellings of
    // shop.com/item/1 collapse to one fetch
    val frontier = allowed.groupBy("curl", "dom")
      .agg(min(col("doc_id")).as("first_seen"), count(lit(1)).as("n_refs"))
    val fetches = Urls.capPerDomain(frontier, "dom", "n_refs", "curl", cap = 2)
      .select("curl").as[String].collect().toSet

    // shop.com had 3 allowed pages (item/1 ×2 refs, item/2, item/3);
    // cap 2 keeps item/1 (most-referenced) then item/2 (tie on 1 ref,
    // lexicographic curl tiebreak); news.org keeps its only page
    assert(fetches === Set(
      "http://shop.com/item/1", "http://shop.com/item/2",
      "http://news.org/story/9"))
  }
}
