package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and per-domain curation — the crawl-side
  * operators a web-scale training pipeline runs before any text-level
  * dedup: the same page is fetched under `http`/`https`, with and
  * without `www.`, with tracking parameters, shuffled query order,
  * fragments, default ports, and trailing slashes, and a corpus that
  * does not canonicalize first double-counts it everywhere downstream
  * (dedup, mixing quotas, per-domain caps).
  *
  * Reference scope: the reference pipelines
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py`)
  * carry no URL columns — this is §8.2 training-data extension
  * surface, a sibling of [[TextAnalysis]].
  *
  * Everything here is built from native `org.apache.spark.sql
  * .functions` string/array expressions (split / substring_index /
  * array_sort / filter / concat_ws) — per-row narrow projections with
  * NO shuffle and no UDF, so the whole canonicalization stays inside
  * one whole-stage-codegen span and scales linearly with the scan at
  * 100 TB. The only shuffling operator in the file is
  * [[Urls.capPerDomain]]'s per-domain window, which shuffles on the
  * registered domain exactly once.
  */
object Urls {

  /** Query parameters that carry tracking state, not content — pages
    * differing only in these are the same page. Matched as a prefix
    * on the `name=` part (`utm_` covers the whole utm family).
    */
  val TrackingPrefixes: Seq[String] = Seq("utm_", "fbclid=", "gclid=")

  /** Multi-part public-suffix second levels (the `co` in
    * `example.co.uk`). A real deployment ships the full public-suffix
    * list as a broadcast lookup; the heuristic covers the dominant
    * patterns and keeps the expression codegen-only.
    */
  val MultiPartSecondLevels: Seq[String] =
    Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Canonical form of an absolute `scheme://host[:port][/path][?q][#f]`
    * URL:
    *
    *   - fragment dropped (client-side only, never part of identity),
    *   - scheme and host lowercased, a leading `www.` stripped,
    *   - the scheme's default port (`:80` http, `:443` https) dropped;
    *     any other explicit port kept,
    *   - trailing `/` stripped from the path (`/a/b/` ≡ `/a/b`, and a
    *     bare `/` root ≡ no path),
    *   - query parameters: tracking params removed
    *     ([[TrackingPrefixes]]), the rest sorted byte-wise and
    *     re-joined, the `?` dropped when nothing survives.
    *
    * Order of operations matters: the query is split off BEFORE the
    * host/path split, so a path-less `http://h?a=1` parses correctly;
    * the fragment is dropped first so `#f` never contaminates either.
    */
  def canonicalizeUrl(url: Column): Column = {
    val nofrag = substring_index(url, "#", 1)
    val base = substring_index(nofrag, "?", 1)
    val query = when(instr(nofrag, "?") > 0,
      substring(nofrag, instr(nofrag, "?") + 1, lit(1 << 20))).otherwise(lit(""))
    val scheme = lower(substring_index(base, "://", 1))
    val rest = substring_index(base, "://", -1)
    val hostport = substring_index(rest, "/", 1)
    val rawPath = substring(rest, length(hostport) + 1, lit(1 << 20))
    val hostRaw = lower(substring_index(hostport, ":", 1))
    val host = when(hostRaw.startsWith("www."),
      substring(hostRaw, lit(5), lit(1 << 20))).otherwise(hostRaw)
    val port = when(instr(hostport, ":") > 0,
      substring(hostport, instr(hostport, ":") + 1, lit(16))).otherwise(lit(""))
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(rawPath, "/+$", "")
    val kept = array_sort(filter(split(query, "&"), p =>
      not(TrackingPrefixes.map(t => p.startsWith(t)).reduce(_ || _)) &&
        p =!= ""))
    val queryPart = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /** Lowercased host of a URL, `www.` stripped, port dropped — the
    * host component of [[canonicalizeUrl]] on its own.
    */
  def hostOf(url: Column): Column = {
    val base = substring_index(substring_index(url, "#", 1), "?", 1)
    val rest = substring_index(base, "://", -1)
    val hostRaw = lower(substring_index(substring_index(rest, "/", 1), ":", 1))
    when(hostRaw.startsWith("www."), substring(hostRaw, lit(5), lit(1 << 20)))
      .otherwise(hostRaw)
  }

  /** Registered (pay-level) domain of a lowercased host: the last two
    * labels, or the last three when the second-to-last label is a
    * multi-part public-suffix second level (`example.co.uk` →
    * `example.co.uk`, `cdn.example.com` → `example.com`). Hosts with
    * ≤ 2 labels are already registered domains. IPv4 literals have no
    * label hierarchy — the whole address IS the registrable unit
    * (label-suffix logic would mangle `192.168.0.1` into `0.1`).
    */
  def registeredDomain(host: Column): Column = {
    val isIpv4 = host.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$")
    val labels = split(host, "\\.")
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(isIpv4 || size(labels) <= 2, host)
      .otherwise(when(element_at(labels, -2)
        .isin(MultiPartSecondLevels.map(x => x: Any): _*), last3)
        .otherwise(last2))
  }

  /** Path component of a canonical absolute URL (query and fragment
    * excluded): `http://h.com/a/b?x=1` → `/a/b`, `http://h.com` → ``.
    */
  def pathOf(url: Column): Column = {
    val rest = substring_index(
      substring_index(substring_index(url, "#", 1), "?", 1), "://", -1)
    val hostport = substring_index(rest, "/", 1)
    substring(rest, length(hostport) + 1, lit(1 << 20))
  }

  /** Robots-style allow/disallow decision per URL under a rule set of
    * `(registeredDomain, pathPrefix, allow)` triples with the
    * longest-match semantics crawlers implement (RFC 9309 / Google):
    * among the URL's domain's rules whose prefix matches its path,
    * the LONGEST prefix wins; equal lengths tie toward allow; no
    * matching rule (or no rules for the domain) means allowed.
    *
    * Scale shape: a real rule corpus is robots-fetch-sized — millions
    * of domains, a handful of prefixes each — which still broadcasts;
    * here the rules compile into ONE literal map-lookup + filter +
    * array_max expression evaluated per row in the scan projection
    * (the `stratumLookup` discipline), so the decision adds NO join
    * and NO shuffle at any corpus size. Longest-match itself is the
    * lexicographic max of `(prefixLen, allowBit)` over the matching
    * rules — no sort, no window.
    *
    * Output: input columns plus `allowed` (boolean) and
    * `matched_len` (longest matching prefix length; 0 = no rule).
    */
  def applyRobotsRules(urls: DataFrame, rules: Seq[(String, String, Boolean)],
      domainCol: String, pathCol: String): DataFrame = {
    require(rules.nonEmpty, "Urls.applyRobotsRules: empty rule set")
    val byDomain = rules.groupBy(_._1).toSeq.sortBy(_._1)
    val ruleMap = map(byDomain.flatMap { case (dom, rs) =>
      Seq(lit(dom), array(rs.map { case (_, prefix, allow) =>
        struct(lit(prefix).as("prefix"),
          lit(if (allow) 1 else 0).as("allow"))
      }: _*))
    }: _*)
    val domRules = element_at(ruleMap, col(domainCol))
    val matched = filter(domRules, r =>
      col(pathCol).startsWith(r.getField("prefix")))
    val best = array_max(transform(matched, r =>
      struct(length(r.getField("prefix")).as("l"), r.getField("allow").as("a"))))
    urls
      .withColumn("_rb", when(domRules.isNull || size(matched) === 0,
        struct(lit(0).as("l"), lit(1).as("a"))).otherwise(best))
      .withColumn("allowed", col("_rb.a") === 1)
      .withColumn("matched_len", col("_rb.l"))
      .drop("_rb")
  }

  /** Per-domain document cap — crawl curation's anti-monoculture
    * control: after URL-level dedup a handful of giant domains still
    * dominate raw counts, so each registered domain keeps at most
    * `cap` documents, best-first by `qualityCol` (ties broken by
    * `idCol` for determinism). One shuffle on the domain; the window
    * is rank-only (no full-partition buffering beyond the sort), and
    * domain skew is bounded because the rank cuts every partition to
    * `cap` rows on output.
    *
    * Output: the input columns plus `domain_rank` (1-based keep
    * order), rows with rank > cap dropped.
    */
  def capPerDomain(docs: DataFrame, domainCol: String, qualityCol: String,
      idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"Urls.capPerDomain: cap must be positive, got $cap")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    docs.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= cap)
  }
}
