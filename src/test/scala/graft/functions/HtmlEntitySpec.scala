package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for [[HtmlEntityExpressions.HtmlEntityDecode]] — the WHATWG
  * numeric rules, the HTML4 named set, the single-pass double-escape
  * semantics, and the strict-semicolon degradation contract.
  */
class HtmlEntitySpec extends SparkSpec {

  private def dec(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(HtmlEntityExpressions.htmlEntityDecode(col("t")))
      .as[String].head()
  }

  test("numeric decimal and hex references, both hex case markers") {
    assert(dec("caf&#233;") === "café")
    assert(dec("it&#x2019;s &#X2019;") === "it’s ’")
    assert(dec("&#65;&#x41;") === "AA")
    // astral plane (one code point, surrogate PAIR in the output)
    assert(dec("&#x1F600;") === new String(Character.toChars(0x1F600)))
  }

  test("WHATWG numeric remapping: NUL, C1 via windows-1252, surrogates, overflow") {
    assert(dec("&#0;") === "�")
    // the windows-1252 block: &#146; is the right single quote CMSes mean
    assert(dec("&#146;") === "’")
    assert(dec("&#128;") === "€")
    assert(dec("&#xD800;") === "�")
    assert(dec("&#1114111;") === new String(Character.toChars(0x10FFFF)))
    assert(dec("&#1114112;") === "�")
    // digit-run overflow clamps instead of wrapping
    assert(dec("&#99999999999999999999;") === "�")
  }

  test("named references: HTML4 set incl. Latin-1, Greek, symbols, apos") {
    assert(dec("&eacute;&Eacute;") === "éÉ")
    assert(dec("A&mdash;B&hellip;") === "A—B…")
    assert(dec("&alpha;&Omega;&euro;&trade;") === "αΩ€™")
    assert(dec("&apos;&quot;") === "'\"")
    assert(dec("&nbsp;") === " ")
    assert(dec("&le;&rarr;&infin;") === "≤→∞")
  }

  test("single pass: double-escaped references are TEXT, never re-decoded") {
    assert(dec("&amp;lt;") === "&lt;")
    assert(dec("&amp;amp;") === "&amp;")
    assert(dec("&amp;#233;") === "&#233;")
  }

  test("strict semicolon + unknown names degrade to literal text") {
    assert(dec("&#233") === "&#233") // numerics ALWAYS need the ';'
    assert(dec("&#;") === "&#;")
    assert(dec("&#x;") === "&#x;")
    assert(dec("&;") === "&;")
    assert(dec("AT&T; a=1&b=2 &foo; &averyveryverylongname;") ===
      "AT&T; a=1&b=2 &foo; &averyveryverylongname;")
    assert(dec("trailing &") === "trailing &")
    assert(dec("&EACUTE;") === "&EACUTE;") // names are case-sensitive
    assert(dec("&mdash end") === "&mdash end") // mdash is NOT legacy
    assert(dec("&euro ok") === "&euro ok")     // euro is NOT legacy
  }

  test("WHATWG legacy subset decodes without ';' unless followed by alnum/=") {
    // r17 verdict ask #3: the HTML4 Latin-1/markup names decode bare
    assert(dec("&copy 2024") === "© 2024")
    assert(dec("caf&eacute plain") === "café plain")
    assert(dec("&eacute") === "é")          // end-of-string terminates
    assert(dec("x &lt y &gt z") === "x < y > z")
    assert(dec("&amp then") === "& then")
    assert(dec("&COPY &REG &AMP.") === "© ® &.") // historic uppercase
    assert(dec("a&nbsp b") === "a  b")
    // the attribute-context exception, applied everywhere: a legacy
    // name followed by an alphanumeric or '=' stays verbatim
    assert(dec("&ampx") === "&ampx")
    assert(dec("&lt3 hearts") === "&lt3 hearts")
    assert(dec("?a=1&not=2&b=3") === "?a=1&not=2&b=3")
    assert(dec("&copyright") === "&copyright") // run is 'copyright', not 'copy'
    // single-pass semantics survive: the decoded '&' of a bare &amp
    // is never re-scanned
    assert(dec("&amp lt;") === "& lt;")
    assert(dec("&amp;lt;") === "&lt;")
  }

  test("extractText folds decoded Unicode whitespace; zero-width survives") {
    import spark.implicits._
    val got = Seq("<p>e&nbsp;f&ensp;g&thinsp;h</p>").toDF("h")
      .select(graft.ext.Html.extractText(col("h"))).as[String].head()
    assert(got === "e f g h")
    val zw = Seq("<p>a&zwnj;b</p>").toDF("h")
      .select(graft.ext.Html.extractText(col("h"))).as[String].head()
    assert(zw === "a‌b")
  }
}
