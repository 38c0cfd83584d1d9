package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for [[Urls]] — edge cases the q207/q208 generator cannot
  * reach (multi-label subdomains, single-label hosts, all-tracking
  * queries) plus the contract properties: idempotence of the
  * canonical form and determinism of the per-domain cap.
  */
class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.canonicalizeUrl(col("u"))).as[String].collect().toSeq
  }

  test("canonicalizeUrl normalizes case, www, default port, slash, fragment, params") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/b/?utm_source=t&b=2&a=1#frag")
      === Seq("https://example.com/a/b?a=1&b=2"))
  }

  test("canonicalizeUrl keeps non-default ports and handles path-less urls") {
    assert(canon(
      "http://x.org:8080/",           // explicit port kept, root slash cut
      "http://www.x.com",             // nothing but host
      "https://x.com?b=1&utm_x=2",    // query with no path
      "http://x.com/p?utm_a=1&gclid=2", // ALL params tracking → '?' dropped
      "http://x.com:80/p"             // default port with a path
    ) === Seq(
      "http://x.org:8080",
      "http://x.com",
      "https://x.com?b=1",
      "http://x.com/p",
      "http://x.com/p"))
  }

  test("canonicalizeUrl is idempotent") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=t&b=2&a=1#frag",
      "http://x.org:8080/", "http://www.x.com", "https://x.com?b=1&utm_x=2",
      "http://cdn.Site.co.uk/i/3?z=9&a=1#x").toDF("u")
    val twice = urls.select(
      Urls.canonicalizeUrl(col("u")).as("once"),
      Urls.canonicalizeUrl(Urls.canonicalizeUrl(col("u"))).as("twice"))
    assert(twice.filter(col("once") =!= col("twice")).count() === 0)
  }

  test("registeredDomain handles 2-label, subdomain, multi-part suffix, single label") {
    import spark.implicits._
    val got = Seq("example.com", "cdn.example.com", "a.b.example.co.uk",
        "example.co.uk", "localhost", "192.168.0.1").toDF("h")
      .select(Urls.registeredDomain(col("h"))).as[String].collect().toSeq
    // an IPv4 literal has no label hierarchy: the address itself is
    // the registrable unit, not its last two octets
    assert(got === Seq("example.com", "example.com", "example.co.uk",
      "example.co.uk", "localhost", "192.168.0.1"))
  }

  test("hostOf strips scheme, www, port, path, query, fragment") {
    import spark.implicits._
    val got = Seq("HTTP://WWW.A.B.Com:8080/p/q?x=1#f", "https://plain.org")
      .toDF("u").select(Urls.hostOf(col("u"))).as[String].collect().toSeq
    assert(got === Seq("a.b.com", "plain.org"))
  }

  test("pathOf takes the path only — no host, port, query, fragment") {
    import spark.implicits._
    val got = Seq("http://h.com/a/b?x=1#f", "https://h.com:8080/p",
        "http://h.com", "http://h.com?x=1")
      .toDF("u").select(Urls.pathOf(col("u"))).as[String].collect().toSeq
    assert(got === Seq("/a/b", "/p", "", ""))
  }

  test("applyRobotsRules: longest match wins, ties allow, no match/rules allow") {
    import spark.implicits._
    val rules = Seq(
      ("d.com", "/p/", false), ("d.com", "/p/1", true),
      ("t.com", "/x", true), ("t.com", "/x", false))
    val urls = Seq(
      ("d.com", "/p/0"),   // /p/ blocks
      ("d.com", "/p/1"),   // longer allow overrides /p/
      ("d.com", "/p/10"),  // /p/1 is a PREFIX of /p/10 → allow wins
      ("d.com", "/q"),     // no matching rule
      ("t.com", "/x/y"),   // equal-length allow+disallow → allow
      ("e.com", "/p/0")    // domain without rules
    ).toDF("dom", "path")
    val got = Urls.applyRobotsRules(urls, rules, "dom", "path")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(2), r.getInt(3))).toSet
    assert(got === Set(
      ("d.com", "/p/0", false, 3), ("d.com", "/p/1", true, 4),
      ("d.com", "/p/10", true, 4), ("d.com", "/q", true, 0),
      ("t.com", "/x/y", true, 2), ("e.com", "/p/0", true, 0)))
    val e = intercept[IllegalArgumentException](
      Urls.applyRobotsRules(urls, Seq.empty, "dom", "path"))
    assert(e.getMessage.contains("empty rule set"))
  }

  test("normalizePercentEncoding: unreserved decode, hex case, malformed passthrough") {
    import spark.implicits._
    def norm(xs: String*): Seq[String] =
      xs.toDF("s").select(Urls.normalizePercentEncoding(col("s")))
        .as[String].collect().toSeq
    assert(norm(
      "a%7eb",        // unreserved ~ decodes, either hex case
      "a%7Eb",
      "a%2fb",        // reserved / stays encoded, hex uppercased
      "%41%5a%61%7a%30%39%2d%2e%5f", // ALPHA/DIGIT/-._ all decode
      "%C3%A9",       // multibyte UTF-8: >= 0x80 per byte, stays encoded
      "a%zzb",        // malformed: not hex → byte-for-byte passthrough
      "tail%",        // malformed: nothing after %
      "%2",           // malformed: one hex digit only
      "plain",        // no escapes at all
      ""              // empty string
    ) === Seq("a~b", "a~b", "a%2Fb", "AZaz09-._", "%C3%A9",
      "a%zzb", "tail%", "%2", "plain", ""))
    // idempotence: a second pass is the identity on every shape above
    val once = norm("a%7eb", "a%2fb", "%C3%A9", "a%zzb", "tail%", "%2")
    assert(norm(once: _*) === once)
  }

  test("canonicalizeUrl percent-normalizes path and query without structural change") {
    // %2F must NOT decode (it would split the path segment); %7e/%61
    // decode; params sort AFTER normalization
    assert(canon("http://h.com/a%2Fb/%7ex?b=%61&a=1")
      === Seq("http://h.com/a%2Fb/~x?a=1&b=a"))
    assert(canon("HTTP://h.com/%7E/") === Seq("http://h.com/~"))
  }

  test("applyRobotsRules: broadcast-join gear decides identically to the literal gear") {
    import spark.implicits._
    val rules = Seq(
      ("d.com", "/p/", false), ("d.com", "/p/1", true),
      ("t.com", "/x", true), ("t.com", "/x", false))
    val urls = Seq(
      ("d.com", "/p/0"), ("d.com", "/p/1"), ("d.com", "/p/10"),
      ("d.com", "/q"), ("t.com", "/x/y"), ("e.com", "/p/0"))
      .toDF("dom", "path")
    def run(maxLit: Int) =
      Urls.applyRobotsRules(urls, rules, "dom", "path", maxLiteralDomains = maxLit)
        .select("dom", "path", "allowed", "matched_len")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getBoolean(2), r.getInt(3))).toSet
    val literal = run(64)
    val joined = run(0) // default: always the join gear
    assert(literal === joined)
    // the join gear really is a join (and the literal gear is not)
    val planJoin = Urls.applyRobotsRules(urls, rules, "dom", "path",
      maxLiteralDomains = 1).queryExecution.executedPlan.toString
    assert(planJoin.contains("BroadcastHashJoin"))
    val planLit = Urls.applyRobotsRules(urls, rules, "dom", "path",
        maxLiteralDomains = 64).queryExecution.executedPlan.toString
    assert(!planLit.contains("Join"))
    // internal-column clash fails fast, not silently
    val e = intercept[IllegalArgumentException](Urls.applyRobotsRules(
      urls.withColumn("_rr_rules", lit(1)), rules, "dom", "path"))
    assert(e.getMessage.contains("_rr_rules"))
  }

  test("withRegisteredDomainPsl: longest suffix, default rule, suffix-only NULL") {
    import spark.implicits._
    val suffixes = graft.PslFixture.Suffixes
    val hosts = Seq(
      "foo.github.io",        // private suffix: registrable is 3 labels
      "deep.foo.github.io",   // ...and one extra subdomain
      "www.beta.com.au",      // ccTLD family
      "a.b.c.example.co.uk",
      "plain.example.com",    // simple TLD
      "example.zz",           // unlisted TLD → default * rule
      "github.io",            // host IS a suffix → strict PSL NULL
      "io",                   // bare listed TLD → NULL too
      "192.168.0.1"           // IPv4: the address is the unit
    ).toDF("host")
    val got = Urls.withRegisteredDomainPsl(hosts, "host", suffixes)
      .select("registered_domain").collect().map(r =>
        Option(r.getString(0)).getOrElse("NULL")).toSeq
    assert(got === Seq("foo.github.io", "foo.github.io", "beta.com.au",
      "example.co.uk", "example.com", "example.zz", "NULL", "NULL",
      "192.168.0.1"))
    // malformed entries are rejected loudly (the publicsuffix grammar)
    for (badList <- Seq(Seq("a.*.b"), Seq("!w.*.ck"), Seq(".com"),
        Seq("com."), Seq("!"), Seq("x!y"))) {
      val e = intercept[IllegalArgumentException](
        Urls.withRegisteredDomainPsl(hosts, "host", badList))
      assert(e.getMessage.contains("malformed suffix"), badList.head)
    }
  }

  test("withRegisteredDomainPsl: exception beats wildcard beats plain (PSL precedence)") {
    import spark.implicits._
    val suffixes = Seq("com", "ck", "*.ck", "!www.ck", "jp", "*.kawasaki.jp")
    val hosts = Seq(
      "a.b.ck",                 // *.ck → suffix b.ck → registered a.b.ck
      "x.a.b.ck",               // ...one deeper: still a.b.ck
      "b.ck",                   // host IS a wildcard-matched suffix → NULL
      "www.ck",                 // !www.ck: exception span IS registrable
      "x.www.ck",               // exception under a subdomain
      "site.city.kawasaki.jp",  // *.kawasaki.jp (depth 3 beats plain jp)
      "city.kawasaki.jp",       // host IS the wildcard suffix → NULL
      "kawasaki.jp",            // only plain 'jp' matches → kawasaki.jp
      "plain.com",              // plain entry rides along
      "ck"                      // bare listed TLD (exact 'ck') → NULL
    ).toDF("host")
    val got = Urls.withRegisteredDomainPsl(hosts, "host", suffixes)
      .select("registered_domain").collect().map(r =>
        Option(r.getString(0)).getOrElse("NULL")).toSeq
    assert(got === Seq("a.b.ck", "a.b.ck", "NULL", "www.ck", "www.ck",
      "site.city.kawasaki.jp", "NULL", "kawasaki.jp", "plain.com", "NULL"))
  }

  test("withRegisteredDomainPsl agrees with the heuristic on its home domain") {
    import spark.implicits._
    // hosts whose suffixes the 7-entry heuristic handles: the PSL
    // variant must group them identically (r14 verdict ask #5)
    val hosts = Seq("example.com", "cdn.example.com", "a.b.example.co.uk",
      "example.co.uk", "x.example.org", "192.168.0.1").toDF("host")
    val both = Urls.withRegisteredDomainPsl(hosts, "host",
        graft.PslFixture.Suffixes, out = "psl")
      .withColumn("heur", Urls.registeredDomain(col("host")))
    // the suffix-only host is the one DOCUMENTED divergence (heuristic
    // returns the host, strict PSL returns NULL) — none here
    assert(both.filter(not(col("psl") <=> col("heur"))).count() === 0)
  }

  test("applyRobotsRules wildcards: * spans, $ anchors, mid-$ literal, length precedence") {
    import spark.implicits._
    val rules = Seq(
      ("d.com", "/p/", true), ("d.com", "/*/1$", false), // 6 beats 3 on /p/1
      ("e.com", "/a$", false),                           // anchor: /a only
      ("f.com", "/x*y", false),                          // spanning *
      ("g.com", "/a$b", false))                          // mid-pattern $ literal
    val urls = Seq(
      ("d.com", "/p/0"), ("d.com", "/p/1"),
      ("e.com", "/a"), ("e.com", "/a/b"),
      ("f.com", "/xzzy"), ("f.com", "/x"),
      ("g.com", "/a$b"), ("g.com", "/ab")).toDF("dom", "path")
    val got = Urls.applyRobotsRules(urls, rules, "dom", "path")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(2), r.getInt(3))).toSet
    assert(got === Set(
      ("d.com", "/p/0", true, 3), ("d.com", "/p/1", false, 5),
      ("e.com", "/a", false, 3), ("e.com", "/a/b", true, 0),
      ("f.com", "/xzzy", false, 4), ("f.com", "/x", true, 0),
      ("g.com", "/a$b", false, 4), ("g.com", "/ab", true, 0)))
  }

  test("resolveUrl: RFC 3986 corners the q225 generator cannot reach") {
    import spark.implicits._
    def res(base: String, href: String): String =
      Seq((base, href)).toDF("b", "h")
        .select(Urls.resolveUrl(col("b"), col("h"))).as[String].head()
    // an ABSOLUTE href still gets dot-segment removal
    assert(res("http://b.com/p/q", "http://x.com/a/./b/../c")
      === "http://x.com/a/c")
    // base without any path: relative href resolves against the root
    assert(res("http://b.com", "img/x.png") === "http://b.com/img/x.png")
    // fragment after query on the href: fragment dies, query lives
    assert(res("http://b.com/a/b", "c?x=1#frag") === "http://b.com/a/c?x=1")
    // fragment-only href inherits the base's QUERY as well as path
    assert(res("http://b.com/p?id=3", "#top") === "http://b.com/p?id=3")
    // empty href = self-reference
    assert(res("http://b.com/p?id=3", "") === "http://b.com/p?id=3")
    // '..' clamps at the root, even from the root itself
    assert(res("http://b.com/", "../../x") === "http://b.com/x")
    // protocol-relative href takes the BASE's scheme
    assert(res("https://b.com/p", "//cdn.com/y") === "https://cdn.com/y")
    // trailing-dot-segment: directory self-reference resolves to the
    // dir WITH its slash (RFC 3986 §5.2.4 — r16b fix: the old
    // slash-dropping form re-anchored child resolutions one level up)
    assert(res("http://b.com/a/b/c.html", ".") === "http://b.com/a/b/")
    // trailing slash survives resolution — a directory base must stay
    // a directory through a resolve→resolve composition (<base href>)
    assert(res("http://b.com/p", "http://cdn.org/assets/")
      === "http://cdn.org/assets/")
    assert(res("http://b.com/dir/page.html", "sub/")
      === "http://b.com/dir/sub/")
    // a malformed (non-absolute) base quarantines to NULL, never a
    // garbage URL into the frontier
    import spark.implicits._
    val nullRes = Seq(("not-a-url", "x/y")).toDF("b", "h")
      .select(Urls.resolveUrl(col("b"), col("h"))).head()
    assert(nullRes.isNullAt(0))
    // a NULL href is NULL output — without the guard the expression
    // fabricated scheme://host (a root link nobody wrote)
    val nullHref = Seq(("http://b.com/p", null.asInstanceOf[String]))
      .toDF("b", "h").select(Urls.resolveUrl(col("b"), col("h"))).head()
    assert(nullHref.isNullAt(0))
  }

  test("path-embedded :// never displaces the authority (first-split pin)") {
    import spark.implicits._
    // redirect/proxy-style paths carry a whole URL: the host is the
    // FIRST authority, not whatever follows the last "://"
    assert(canon("http://h.com/r/https://x.com/y")
      === Seq("http://h.com/r/https://x.com/y"))
    val host = Seq("http://h.com/r/https://x.com/y").toDF("u")
      .select(Urls.hostOf(col("u"))).as[String].head()
    assert(host === "h.com")
    val path = Seq("http://h.com/r/https://x.com/y").toDF("u")
      .select(Urls.pathOf(col("u"))).as[String].head()
    assert(path === "/r/https://x.com/y")
    // resolveUrl: both the BASE and an ABSOLUTE HREF with embedded
    // URLs keep their real authorities (empty segments collapse per
    // the documented dot-segment convention)
    val r1 = Seq(("http://b.com/r/https://x.com/y", "z")).toDF("b", "h")
      .select(Urls.resolveUrl(col("b"), col("h"))).as[String].head()
    assert(r1 === "http://b.com/r/https:/x.com/z")
    val r2 = Seq(("http://b.com/p", "http://a.com/r/https://x.com/y"))
      .toDF("b", "h")
      .select(Urls.resolveUrl(col("b"), col("h"))).as[String].head()
    assert(r2 === "http://a.com/r/https:/x.com/y")
  }

  test("robots precedence counts pattern OCTETS, not characters") {
    import spark.implicits._
    // path /päge/1: the plain allow "/päge" is 5 chars but 6 UTF-8
    // bytes — equal to the 6-byte wildcard disallow "/*ge/1", so the
    // byte-length tie breaks toward ALLOW (character-length precedence
    // would rank the wildcard longer and disallow)
    val urls = Seq(("d.com", "/päge/1")).toDF("dom", "path")
    val rules = Seq(("d.com", "/päge", true), ("d.com", "/*ge/1", false))
    val got = Urls.applyRobotsRules(urls, rules, "dom", "path")
      .select("allowed", "matched_len").head()
    assert(got.getBoolean(0) === true)
    assert(got.getInt(1) === 6)
  }

  test("withIdnAsciiHost folds Unicode hosts to punycode, ASCII passes through") {
    import spark.implicits._
    val got = Seq("bücher.example", "BÜCHER.example", "東京.jp",
        "пример.рф", "xn--bcher-kva.example", "plain.example")
      .toDF("h")
    val folded = Urls.withIdnAsciiHost(got, "h")
      .select("host_idn").as[String].collect().toSeq
    // constants verified against java.net.IDN; nameprep case-folds
    // BEFORE punycode, so the uppercase form lands on the same string
    assert(folded === Seq("xn--bcher-kva.example", "xn--bcher-kva.example",
      "xn--1lqs71d.jp", "xn--e1afmkfd.xn--p1ai",
      "xn--bcher-kva.example", "plain.example"))
  }

  test("withIdnAsciiHost keeps unfoldable hosts and is idempotent") {
    import spark.implicits._
    val df = Seq("é..example", "bücher.example", "plain.example", "東京.jp")
      .toDF("h")
    val once = Urls.withIdnAsciiHost(df, "h", out = "f1")
    // the empty-label host is rejected by the codec → original kept
    assert(once.filter(col("h") === "é..example")
      .select("f1").as[String].head() === "é..example")
    // second fold is the identity (outputs are ASCII or the unchanged
    // original)
    val twice = Urls.withIdnAsciiHost(once, "f1", out = "f2")
    assert(twice.filter(col("f1") =!= col("f2")).count() === 0)
  }

  test("withIdnFoldedUrl rewrites only the host span") {
    import spark.implicits._
    val got = Seq(
      "https://東京.jp:8443/t?id=1&utm_x=1#frag", // port+query+fragment kept
      "http://bücher.example/p/2",
      "http://café1.fr",                          // path-less
      "https://東京.jp?q=1",                       // query BEFORE any path
      "http://plain.example/a?z=0",               // ASCII fast path
      "no-scheme-at-all").toDF("u")               // no authority → unchanged
    val folded = Urls.withIdnFoldedUrl(got, "u")
      .select("url_idn").as[String].collect().toSeq
    assert(folded === Seq(
      "https://xn--1lqs71d.jp:8443/t?id=1&utm_x=1#frag",
      "http://xn--bcher-kva.example/p/2",
      "http://xn--caf1-dpa.fr",
      "https://xn--1lqs71d.jp?q=1",
      "http://plain.example/a?z=0",
      "no-scheme-at-all"))
  }

  test("withIdnFoldedUrl agrees with withIdnAsciiHost on the host component") {
    import spark.implicits._
    val urls = Seq("http://bücher.example/p", "https://東京.jp:1/x?y=1",
      "http://plain.example/", "http://é..example/q").toDF("u")
    val viaUrl = Urls.withIdnFoldedUrl(urls, "u")
      .select(Urls.hostOf(col("url_idn")).as("h1"))
    val viaHost = Urls.withIdnAsciiHost(
        urls.select(Urls.hostOf(col("u")).as("h")), "h", out = "h2")
      .select("h2")
    assert(viaUrl.as[String].collect().toSeq ===
      viaHost.as[String].collect().toSeq)
  }

  test("schedulePolite serializes per host with the delay, default for NULL") {
    import spark.implicits._
    val frontier = Seq(
      ("a.com", 1L, Some(2.5)), ("a.com", 2L, Some(2.5)),
      ("a.com", 3L, Some(2.5)),
      ("b.com", 4L, None), ("b.com", 5L, None)).toDF("host", "uid", "delay")
    val got = Urls.schedulePolite(frontier, "host", "uid", "delay",
        defaultDelaySecs = 1.0)
      .select("host", "uid", "fetch_slot", "fetch_offset_secs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === Set(
      ("a.com", 1L, 0L, 0.0), ("a.com", 2L, 1L, 2.5), ("a.com", 3L, 2L, 5.0),
      ("b.com", 4L, 0L, 0.0), ("b.com", 5L, 1L, 1.0)))
    val e = intercept[IllegalArgumentException](
      Urls.schedulePolite(frontier, "host", "uid", "delay", -1.0))
    assert(e.getMessage.contains("negative default delay"))
  }

  test("followRedirects resolves chains, loops, dangling targets, hop limits") {
    import spark.implicits._
    val pages = Seq(
      ("a", Some("b")), ("b", Some("c")), ("c", None), // 2-edge chain
      ("d", Some("e")), ("e", Some("d")),              // 2-cycle
      ("f", Some("x")),                                // dangling target
      ("s", Some("s"))                                 // self-loop
    ).toDF("url", "next")
    val got = Urls.followRedirects(pages, "url", "next", maxHops = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got === Set(
      ("a", "c", 2L, "ok"), ("b", "c", 1L, "ok"), ("c", "c", 0L, "ok"),
      ("d", "d", 2L, "loop"), ("e", "e", 2L, "loop"),
      ("f", "x", 1L, "dangling"), ("s", "s", 1L, "loop")))
    // one extra start above the budget → hop_limit, honestly reported
    val long = Seq(("p0", Some("p1")), ("p1", Some("p2")), ("p2", Some("p3")),
      ("p3", Some("p4")), ("p4", None)).toDF("url", "next")
    val lim = Urls.followRedirects(long, "url", "next", maxHops = 3)
      .filter(col("url") === "p0")
      .select("final_url", "n_hops", "outcome").head()
    assert((lim.getString(0), lim.getLong(1), lim.getString(2))
      === (("p3", 3L, "hop_limit")))
    val e = intercept[IllegalArgumentException](
      Urls.followRedirects(pages, "url", "next", maxHops = 0))
    assert(e.getMessage.contains("maxHops"))
  }

  test("surtKey reverses host labels, keeps IPv4, carries path+query") {
    import spark.implicits._
    val got = Seq(
      "http://a.shop.com/x/1?id=2", // subdomain
      "http://shop.com/x",          // its registered domain — shared prefix
      "http://localhost/p",         // single label
      "http://10.0.3.1/z?a=1",      // IPv4 stays natural order
      "http://h.com"                // path-less
    ).toDF("u").select(Urls.surtKey(col("u"))).as[String].collect().toSeq
    assert(got === Seq(
      "com,shop,a)/x/1?id=2", "com,shop)/x", "localhost)/p",
      "10.0.3.1)/z?a=1", "com,h)"))
    // the contiguity property: every URL of one registered domain
    // sorts inside the domain's key prefix range
    assert(got.head.startsWith("com,shop"))
    assert(got(1).startsWith("com,shop"))
  }

  test("capPerDomain keeps the cap best rows per domain, ties by id") {
    import spark.implicits._
    val docs = Seq(
      ("d1", 10L, 1L), ("d1", 30L, 2L), ("d1", 30L, 3L), ("d1", 5L, 4L),
      ("d2", 7L, 5L)).toDF("dom", "q", "id")
    val got = Urls.capPerDomain(docs, "dom", "q", "id", cap = 2)
      .select("dom", "id", "domain_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // d1: quality 30 ties on ids 2,3 → both beat 10; id 2 ranks first
    assert(got === Set(("d1", 2L, 1), ("d1", 3L, 2), ("d2", 5L, 1)))
    val e = intercept[IllegalArgumentException](
      Urls.capPerDomain(docs, "dom", "q", "id", cap = 0))
    assert(e.getMessage.contains("cap must be positive"))
  }

  test("pathTemplate: hex rule fires before digit-run shredding; static survives") {
    import spark.implicits._
    val got = Seq("/product/1234/view", "/user/u7/profile",
      "/doc/0123456789abcdef0123456789abcdef/raw", "/static/css/main.css",
      "/a1b2/x")
      .toDF("p").select(Urls.pathTemplate(col("p"))).as[String].collect().toSeq
    assert(got === Seq("/product/{n}/view", "/user/u{n}/profile",
      "/doc/{hex}/raw", "/static/css/main.css", "/a{n}b{n}/x"))
  }

  test("matchBlocklist: label-suffix match, subtree inherit, never substring") {
    import spark.implicits._
    val urls = Seq((1L, "sub.bad.net"), (2L, "notbad.net"), (3L, "bad.net"),
      (4L, "deep.a.bad.net"), (5L, "clean.org")).toDF("id", "host")
    val bl = Seq(("BAD.net", "adult"), ("bad.net", "malware"))
      .toDF("domain", "category")
    val got = Urls.matchBlocklist(urls, "id", "host", bl, "domain", "category")
      .select(col("id"), concat_ws(",", col("categories")), col("blocked"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .toSet
    // entries case-fold and accumulate sorted; notbad.net shares the
    // character suffix but not a LABEL suffix; depth does not matter
    assert(got === Set(
      (1L, "adult,malware", true), (2L, "", false),
      (3L, "adult,malware", true), (4L, "adult,malware", true),
      (5L, "", false)))
    // maxLabels caps the chain: with 1 label only TLD-level entries hit
    val tld = Urls.matchBlocklist(urls, "id", "host",
        Seq(("bad.net", "x")).toDF("domain", "category"),
        "domain", "category", maxLabels = 1)
      .filter(col("blocked")).count()
    assert(tld === 0L)
  }

  test("matchBlocklist: FQDN trailing dot and empty labels normalize on BOTH sides") {
    import spark.implicits._
    // trailing root-dot hosts, doubled dots, and a dot-only host must
    // fold before the suffix chain; list entries normalize identically
    val urls = Seq((1L, "sub.bad.net."), (2L, "bad..net"), (3L, "."),
      (4L, "clean.org."), (5L, "good.net")).toDF("id", "host")
    val bl = Seq(("bad.net.", "adult"), ("good.net", "x"))
      .toDF("domain", "category")
    val got = Urls.matchBlocklist(urls, "id", "host", bl, "domain", "category")
      .select(col("id"), concat_ws(",", col("categories")), col("blocked"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .toSet
    assert(got === Set(
      (1L, "adult", true), (2L, "adult", true), (3L, "", false),
      (4L, "", false), (5L, "x", true)))
  }
}
