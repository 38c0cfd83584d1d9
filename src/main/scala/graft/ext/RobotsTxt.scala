package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt PARSING (RFC 9309 grammar) — the producer side of
  * [[Urls.applyRobotsRules]]: a crawler does not receive rule tuples,
  * it fetches `robots.txt` BODIES, and the rules a frontier obeys are
  * parsed per domain from that text. This is the step that turns the
  * robots decision from a hand-authored literal into DATA — at crawl
  * scale the rule corpus is a (domain, rules) TABLE maintained by the
  * fetcher, which is exactly the shape
  * [[Urls.applyRobotsRulesFrom]] consumes.
  *
  * Reference scope: §8.2 extension surface (the reference ingests one
  * CSV); sibling of [[Html]] and [[Http]] in the crawl stack.
  *
  * Grammar subset (RFC 9309 §2.2, targeting the `*` product token):
  *
  *   - `#` starts a comment (rest of line dropped),
  *   - directive names are case-INsensitive (`DISALLOW:` parses),
  *     values (path prefixes) are case-sensitive,
  *   - consecutive `User-agent:` lines STACK into one group (rules
  *     that follow bind to every stacked agent); a `User-agent:` line
  *     after rules starts a NEW group,
  *   - rules in groups naming `*` are kept; other groups' rules are
  *     ignored (we crawl as the generic agent),
  *   - an EMPTY `Disallow:` value means "nothing disallowed" — it is
  *     a group marker, never a rule; empty `Allow:` likewise,
  *   - lines before any group, blank lines, and unknown directives
  *     (`Crawl-delay:`, `Sitemap:`) change nothing,
  *   - RFC wildcard path patterns are COMPILED: `*` → `.*`, a
  *     trailing `$` → end anchor, everything else regex-escaped; the
  *     rule's `rx` field carries the regex (NULL for plain prefixes)
  *     and the decision layer matches it with `regexp_like`,
  *     precedence still by pattern length (the RFC's
  *     most-specific-match rule, Google's reference behavior).
  *
  * The parser is ONE native expression: `split` on line breaks, then
  * an `aggregate` HOF threading a (in_star_group, seen_rules, rules)
  * accumulator across lines — no UDF, no shuffle, whole-stage
  * codegen; at 100 TB parsing rides the robots-fetch scan. The
  * output column is `array<struct<prefix, allow, rx>>`, directly
  * joinable by [[Urls.applyRobotsRulesFrom]].
  */
object RobotsTxt {

  /** Parse one robots.txt body into the `*`-agent rule array
    * (`struct(prefix string, allow int, rx string)` per rule, document
    * order — the [[Urls.applyRobotsRulesFrom]] shape). `rx` is the
    * compiled Java regex for RFC 9309 WILDCARD patterns (`*` = any
    * sequence, trailing `$` = end anchor), NULL for the plain-prefix
    * majority so those stay on the decision layer's `startsWith` fast
    * path; a mid-pattern `$` is literal, per the RFC's grammar.
    */
  def parseRules(txt: Column): Column = {
    // a UTF-8 BOM on the first line (real robots.txt files routinely
    // carry one) would break the first directive's startsWith match —
    // strip it before the line split
    val lines = split(regexp_replace(txt, "^\\uFEFF", ""), "\r?\n")
    val init = struct(
      lit(false).as("in_star"), lit(false).as("after_rules"),
      array().cast("array<struct<prefix:string,allow:int,rx:string>>")
        .as("rules"))
    aggregate(lines, init, (a, rawLine) => {
      val line = trim(substring_index(rawLine, "#", 1))
      val low = lower(line)
      val isUa = low.startsWith("user-agent:")
      val isDis = low.startsWith("disallow:")
      val isAll = low.startsWith("allow:")
      val isDelay = low.startsWith("crawl-delay:")
      val value = trim(substring(line, instr(line, ":") + 1, lit(1 << 20)))
      // stacked UA lines extend the group (in_star sticks until rules
      // have been seen); a UA line after rules starts a fresh group.
      // Crawl-delay counts as a RULE for stacking purposes (the
      // Google-parser convention, shared with [[parseCrawlDelay]] and
      // [[parsePolicy]] so the three parsers agree on group
      // boundaries); Sitemap stays group-independent and never ends
      // stacking.
      val inStar = when(isUa,
          (value === "*") || (a.getField("in_star") && !a.getField("after_rules")))
        .otherwise(a.getField("in_star"))
      val afterRules = when(isUa, lit(false))
        .otherwise(a.getField("after_rules") || isDis || isAll || isDelay)
      val appendRule = a.getField("in_star") && (isDis || isAll) && value =!= ""
      // wildcard compile (in-expression twin of Urls.robotsPatternRx,
      // match-equivalent by RobotsTxtSpec): escape regex metachars,
      // then the escaped \* becomes .*; trailing $ becomes the anchor
      val anchored = value.endsWith("$")
      val core = when(anchored,
        substring(value, lit(1), length(value) - 1)).otherwise(value)
      val escaped = regexp_replace(core, "([\\\\.\\[\\]{}()*+?^$|])", "\\\\$1")
      val rxBody = regexp_replace(escaped, "\\\\\\*", ".*")
      val hasWild = instr(value, "*") > 0 || anchored
      val rx = when(hasWild, concat(lit("^"), rxBody,
          when(anchored, lit("$")).otherwise(lit(""))))
        .otherwise(lit(null).cast("string"))
      val rules = when(appendRule,
          concat(a.getField("rules"), array(struct(value.as("prefix"),
            when(isAll, lit(1)).otherwise(lit(0)).as("allow"),
            rx.as("rx")))))
        .otherwise(a.getField("rules"))
      struct(inStar.as("in_star"), afterRules.as("after_rules"),
        rules.as("rules"))
    }, a => a.getField("rules"))
  }

  /** All `Sitemap:` directive values of a robots.txt body, in document
    * order — the frontier feed [[parseRules]] deliberately flows past
    * (rules bind to agent groups; `Sitemap:` is GROUP-INDEPENDENT per
    * the sitemaps.org protocol, valid anywhere in the file). Directive
    * name case-insensitive, value trimmed, `#` comments stripped (the
    * [[parseRules]] line discipline — the FIRST `:` is the directive
    * colon, so the URL's own `://` never splits wrong), a leading
    * UTF-8 BOM tolerated. One native filter/transform over the line
    * split — no UDF, no shuffle; the output column feeds a fetch join
    * against the sitemap bodies (see the q233 gate).
    */
  /** The `*`-agent group's `Crawl-delay:` value in seconds (DOUBLE),
    * NULL when the group carries none — the politeness knob
    * [[graft.ext.Urls.schedulePolite]] consumes. Nonstandard but
    * widely honored (Bing/Yandex semantics): the directive binds to
    * its agent GROUP like a rule line, so the [[parseRules]] group
    * machine is replayed here with `Crawl-delay` itself counting as a
    * rule for stacking purposes (a UA line after it starts a fresh
    * group). The FIRST value in a `*` group wins; a non-numeric value
    * is NULL (quarantine, never a guessed delay — `try_cast`
    * discipline under ANSI mode). Decimal values (`0.5`) are real:
    * large crawlers batch sub-second delays.
    */
  def parseCrawlDelay(txt: Column): Column = {
    val lines = split(regexp_replace(txt, "^\\uFEFF", ""), "\r?\n")
    val init = struct(
      lit(false).as("in_star"), lit(false).as("after_rules"),
      lit(null).cast("double").as("delay"))
    aggregate(lines, init, (a, rawLine) => {
      val line = trim(substring_index(rawLine, "#", 1))
      val low = lower(line)
      val isUa = low.startsWith("user-agent:")
      val isDis = low.startsWith("disallow:")
      val isAll = low.startsWith("allow:")
      val isDelay = low.startsWith("crawl-delay:")
      val value = trim(substring(line, instr(line, ":") + 1, lit(1 << 20)))
      val inStar = when(isUa,
          (value === "*") || (a.getField("in_star") && !a.getField("after_rules")))
        .otherwise(a.getField("in_star"))
      val afterRules = when(isUa, lit(false))
        .otherwise(a.getField("after_rules") || isDis || isAll || isDelay)
      val capture = a.getField("in_star") && isDelay &&
        a.getField("delay").isNull
      val delay = when(capture,
          when(value.rlike("^[0-9]+(\\.[0-9]+)?$"), value.cast("double"))
            .otherwise(lit(null).cast("double")))
        .otherwise(a.getField("delay"))
      struct(inStar.as("in_star"), afterRules.as("after_rules"),
        delay.as("delay"))
    }, a => a.getField("delay"))
  }

  /** The WHOLE fetch policy in ONE pass —
    * `struct(rules, crawl_delay, sitemaps)` — fusing [[parseRules]],
    * [[parseCrawlDelay]], and [[parseSitemaps]] into a single
    * `aggregate` state machine: a fetcher maintains all three per
    * domain, and three separate parses walk the same robots body three
    * times (the line split and group-state threading re-run per
    * parser). Semantics are EXACTLY the three parsers' (spec-pinned
    * equal on hostile bodies): group stacking ends on any rule line
    * (Disallow/Allow/Crawl-delay), `Sitemap:` stays group-independent,
    * first valid delay wins, comments/BOM as everywhere.
    */
  def parsePolicy(txt: Column): Column = {
    val lines = split(regexp_replace(txt, "^\\uFEFF", ""), "\r?\n")
    val init = struct(
      lit(false).as("in_star"), lit(false).as("after_rules"),
      array().cast("array<struct<prefix:string,allow:int,rx:string>>")
        .as("rules"),
      lit(null).cast("double").as("delay"),
      array().cast("array<string>").as("sitemaps"))
    aggregate(lines, init, (a, rawLine) => {
      val line = trim(substring_index(rawLine, "#", 1))
      val low = lower(line)
      val isUa = low.startsWith("user-agent:")
      val isDis = low.startsWith("disallow:")
      val isAll = low.startsWith("allow:")
      val isDelay = low.startsWith("crawl-delay:")
      val isSitemap = low.startsWith("sitemap:")
      val value = trim(substring(line, instr(line, ":") + 1, lit(1 << 20)))
      val inStar = when(isUa,
          (value === "*") || (a.getField("in_star") && !a.getField("after_rules")))
        .otherwise(a.getField("in_star"))
      val afterRules = when(isUa, lit(false))
        .otherwise(a.getField("after_rules") || isDis || isAll || isDelay)
      // the parseRules wildcard compile, verbatim
      val appendRule = a.getField("in_star") && (isDis || isAll) && value =!= ""
      val anchored = value.endsWith("$")
      val core = when(anchored,
        substring(value, lit(1), length(value) - 1)).otherwise(value)
      val escaped = regexp_replace(core, "([\\\\.\\[\\]{}()*+?^$|])", "\\\\$1")
      val rxBody = regexp_replace(escaped, "\\\\\\*", ".*")
      val hasWild = instr(value, "*") > 0 || anchored
      val rx = when(hasWild, concat(lit("^"), rxBody,
          when(anchored, lit("$")).otherwise(lit(""))))
        .otherwise(lit(null).cast("string"))
      val rules = when(appendRule,
          concat(a.getField("rules"), array(struct(value.as("prefix"),
            when(isAll, lit(1)).otherwise(lit(0)).as("allow"),
            rx.as("rx")))))
        .otherwise(a.getField("rules"))
      val capture = a.getField("in_star") && isDelay &&
        a.getField("delay").isNull
      val delay = when(capture,
          when(value.rlike("^[0-9]+(\\.[0-9]+)?$"), value.cast("double"))
            .otherwise(lit(null).cast("double")))
        .otherwise(a.getField("delay"))
      val sitemaps = when(isSitemap && value =!= "",
          concat(a.getField("sitemaps"), array(value)))
        .otherwise(a.getField("sitemaps"))
      struct(inStar.as("in_star"), afterRules.as("after_rules"),
        rules.as("rules"), delay.as("delay"), sitemaps.as("sitemaps"))
    }, a => struct(a.getField("rules").as("rules"),
      a.getField("delay").as("crawl_delay"),
      a.getField("sitemaps").as("sitemaps")))
  }

  def parseSitemaps(txt: Column): Column = {
    val lines = split(regexp_replace(txt, "^\\uFEFF", ""), "\r?\n")
    val vals = transform(lines, rawLine => {
      val line = trim(substring_index(rawLine, "#", 1))
      when(lower(line).startsWith("sitemap:"),
        trim(substring(line, instr(line, ":") + 1, lit(1 << 20))))
        .otherwise(lit(null).cast("string"))
    })
    filter(vals, v => v.isNotNull && v =!= "")
  }

  /** RFC 9309 §2.3.1 fetch-outcome policy — what a crawler may do
    * when the robots.txt FETCH itself resolves, before any rule is
    * read: 2xx parses and applies rules; 4xx means "unreachable" and
    * the whole host MAY be crawled (allow-all — a missing robots.txt
    * is not a lock); 5xx (and an unparseable/absent status — the
    * network-error analog) means the crawler MUST assume complete
    * disallow; 3xx follows the redirect (resolution is
    * [[graft.ext.Urls.followRedirects]]' job). Getting 4xx vs 5xx
    * BACKWARD either locks crawlers out of every robots-less site or
    * crawls through an outage — this tiny branch is
    * production-critical, hence named and gated.
    */
  def accessPolicy(status: Column): Column =
    when(status.isNull || status >= 500, lit("disallow_all"))
      .when(status >= 400, lit("allow_all"))
      .when(status >= 300, lit("follow_redirect"))
      .otherwise(lit("apply_rules"))
}
