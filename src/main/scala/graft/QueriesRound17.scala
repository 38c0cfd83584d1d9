package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 wave. Each query sits next to its DuckDB oracle
  * (trait pair discipline, VERDICT r9 #4).
  */
private[graft] trait PipelinesRound17 { this: PipelinesBase =>

  /** Full HTML character-reference decoding as a hash gate
    * ([[graft.functions.HtmlEntityExpressions.HtmlEntityDecode]]
    * through [[graft.ext.Html.extractText]] / `extractMainText` /
    * `extractTitle` — r16 verdict ask #1): per doc a page whose
    * visible text exercises one decode branch each —
    *
    *   - k=0: numeric DECIMAL (`&#233;` → é);
    *   - k=1: numeric HEX (`&#x2019;` → ’);
    *   - k=2: NAMED references beyond the old 6-entity set
    *     (`&eacute;`, `&mdash;`);
    *   - k=3: the WHATWG windows-1252 remap (`&#146;` → ’, `&#128;`
    *     → €) — the C1 range real CMSes emit;
    *   - k=4: DOUBLE-ESCAPED text (`&amp;lt;` is the TEXT `&lt;`,
    *     single-pass, never re-decoded into markup);
    *   - k=5: quarantine/degradation — a surrogate reference decodes
    *     to U+FFFD, unknown names (`&foo;`), unterminated references
    *     (`AT&T;`) and bare URL ampersands (`a=1&b=2`) stay verbatim.
    *
    * The page also carries the composition hazards: an entity inside
    * a `<script>` body (dies WITH the body, never decoded), `&nbsp;`
    * in the title (decodes to U+00A0, folded by the Unicode
    * whitespace collapse), a link-saturated nav and a short tail that
    * `extractMainText`'s density rules must kill while KEEPING the
    * entity-bearing paragraph (the q228 re-verification, on fixtures
    * q228 never had). Oracle: the generator arithmetic replayed with
    * the decoded characters as literals.
    */
  def entityDecode(s: SparkSession, d: String): DataFrame = {
    val i = col("doc_id")
    val k = pmod(i, lit(6))
    val istr = i.cast("string")
    val branch = when(k === 0, lit("caf&#233; au lait"))
      .when(k === 1, lit("it&#x2019;s fine"))
      .when(k === 2, lit("r&eacute;sum&eacute; &mdash; done"))
      .when(k === 3, lit("quote &#146; euro &#128;"))
      .when(k === 4, lit("x &amp;lt; y &amp;amp; z"))
      .otherwise(lit("bad &#xD800; &foo; AT&T; a=1&b=2"))
    val html = concat(
      lit("<html><head><title>T&nbsp;"), istr,
      lit("</title></head><body>" +
        "<div><a href=\"/a\">Home</a> <a href=\"/b\">About</a></div>" +
        "<script>var a = '&#233;';</script><p>"),
      branch, lit(" g"), istr,
      lit(" paragraph body text long enough to keep.</p>" +
        "<div>tail&hellip; short</div></body></html>"))
    t(s, d, "documents")
      .select(col("doc_id"), html.as("html"))
      .select(col("doc_id"),
        graft.ext.Html.extractText(col("html")).as("text"),
        graft.ext.Html.extractMainText(col("html")).as("main_text"),
        graft.ext.Html.extractTitle(col("html")).as("title"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .orderBy("doc_id")
  }
}

private[graft] trait OraclesRound17 { this: OracleSnippets =>

  protected def sqlRound17: Map[String, String] = Map(
    // q271: the generator arithmetic restated with DECODED literals —
    // ’/—/é/€/… below are the real code points, U+FFFD for the
    // surrogate branch; the double-escape branch stays TEXT (&lt;)
    // and the k=5 degradations stay verbatim.
    "q271_entity_decode" ->
      """WITH b AS (SELECT doc_id, doc_id % 6 AS k,
        |    CAST(doc_id AS VARCHAR) AS s
        |  FROM documents),
        |e AS (SELECT doc_id, s,
        |  CASE WHEN k = 0 THEN 'café au lait'
        |       WHEN k = 1 THEN 'it’s fine'
        |       WHEN k = 2 THEN 'résumé — done'
        |       WHEN k = 3 THEN 'quote ’ euro €'
        |       WHEN k = 4 THEN 'x &lt; y &amp; z'
        |       ELSE 'bad � &foo; AT&T; a=1&b=2' END AS branch
        |  FROM b),
        |o AS (SELECT doc_id, s, branch,
        |    'T ' || s || ' Home About ' || branch || ' g' || s ||
        |      ' paragraph body text long enough to keep. tail… short' AS text
        |  FROM e)
        |SELECT doc_id, text,
        |  branch || ' g' || s ||
        |    ' paragraph body text long enough to keep.' AS main_text,
        |  'T ' || s AS title,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM o ORDER BY doc_id""".stripMargin)
}
