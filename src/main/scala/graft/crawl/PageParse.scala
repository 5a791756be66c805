package graft
package crawl

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern
import scala.collection.mutable

/** Page parsing surface shared verbatim by the Spark engine and the
  * sequential RefSpec oracle (so crawl-equivalence tests compare
  * SCHEDULING, not parsing). Delegates to the full
  * [[graft.extract.ArticleExtractor]] port: link harvest (F4/F5),
  * boilerplate/gravity extraction (F6-F13), title/date/authors (F14-F18).
  *
  * The `len(html) < 200` gate mirrors
  * /root/reference/crawling_tools/crawler.py:132-136: short pages are
  * still recorded as scraped but yield no extraction and no links.
  */
object PageParse {

  case class Parsed(title: String, text: String, links: List[String],
                    isWebnewsMeta: Boolean, publishDate: String,
                    authors: List[String], videos: List[String],
                    sections: List[String], topImage: String,
                    canonical: String, language: String,
                    /** S5: filtered third-party resources, from the SAME
                      * DOM parse as the extraction (no second parse).
                      */
                    resources: List[String])

  val Empty: Parsed = Parsed(null, "", Nil, isWebnewsMeta = false, null,
    Nil, Nil, Nil, "", "", null, Nil)

  def parse(htmlBytes: Array[Byte], url: String,
            isWebnews: Boolean): Parsed = {
    val html = new String(htmlBytes, StandardCharsets.UTF_8)
    if (html.length < 200) return Empty // crawler.py:132
    // Sitemap bodies (urlset page lists / sitemapindex child-sitemap
    // lists) yield their <loc> values as frontier candidates — checked
    // BEFORE the feed branch (isFeed accepts any <?xml prologue). A
    // NEW-engine capability; the reference never reads sitemaps.
    if (graft.extract.SitemapParse.isSitemap(html)) {
      val seen = mutable.LinkedHashSet.empty[String]
      graft.extract.SitemapParse.locs(html).foreach { l =>
        val cleaned = UrlOps.cleanUrl(l, removeArguments = false)
        if (UrlOps.isValidUrl(cleaned)) seen += cleaned
      }
      return Parsed(null, "", seen.toList, isWebnewsMeta = false, null,
        Nil, Nil, Nil, "", "", null, Nil)
    }
    // S8 — a fetched feed body yields its entry links as frontier
    // candidates (reference: feedparser entries inserted with scraped=0,
    // crawler.py:435-463; links cleaned with remove_arguments=False,
    // crawler.py:461), no article extraction
    if (graft.extract.RssParse.isFeed(html)) {
      val seen = mutable.LinkedHashSet.empty[String]
      graft.extract.RssParse.entries(html).foreach { e =>
        val cleaned = UrlOps.cleanUrl(e.link, removeArguments = false)
        if (UrlOps.isValidUrl(cleaned)) seen += cleaned
      }
      return Parsed(null, "", seen.toList, isWebnewsMeta = false, null,
        Nil, Nil, Nil, "", "", null, Nil)
    }
    val domain = UrlOps.getPrincipalDomain(url)
    // Per-row error containment: the reference's lxml is a recovering
    // parser that never throws on malformed web HTML
    // (extractor.py:49-71 tolerates arbitrary input); this engine's
    // strict Dom.parse raises on mismatched tags. One bad page must
    // degrade to "no extraction, no links" — like the <200-char gate —
    // not fail the Spark task and abort the crawl wave.
    try {
      val e = graft.extract.ArticleExtractor.extractStr(html, url, domain, isWebnews)
      // discovered feed urls ride after the page links in document order
      // (deterministic linkIdx; the reference fetches feeds in a separate
      // startup pass — table-world timing folds them into the frontier)
      val links = (mutable.LinkedHashSet.empty[String]
        ++= e.inLinks ++= e.feedLinks).toList
      Parsed(e.title, e.text, links, e.isNewsMeta, e.publishDate,
        e.authors, e.videos, e.sections, e.topImage, e.canonicalLink,
        e.language,
        graft.operators.Resources.filterThirdParty(e.resourceLinks, url))
    } catch {
      case scala.util.control.NonFatal(_) => Empty
    }
  }
}

/** robots.txt rules (a NEW-engine requirement — the reference never reads
  * robots.txt; see SURVEY.md §7.1 note). RFC 9309 grouping + agent
  * selection + rule matching (`Allow`/`Disallow`, `*` wildcards, `$`
  * end-anchor, longest-rule precedence with Allow winning length ties),
  * plus the de-facto `Crawl-delay` extension.
  *
  * Selected rules travel through the engine as ONE `array<string>`
  * column (the [[graft.functions.RobotsDisallowedExpr]] input): each
  * entry is `'A'|'D'` + the rule path, PRE-SORTED by (path length desc,
  * Allow-before-Disallow, path) so evaluation is first-match-wins — the
  * RFC 9309 §2.2.2 most-specific-match rule applied once at parse time
  * instead of per probed URL. Empty rule paths are ignored (an empty
  * `Disallow:` allows all, per the RFC's example).
  */
object Robots {

  /** One RFC 9309 rule group: the consecutive `User-agent` lines that
    * open it (lowercased product tokens), its Allow/Disallow rule paths,
    * and the group's `Crawl-delay` in seconds (0 = unset; de-facto
    * extension honored by the batch scheduler as a per-host budget
    * floor and by the streaming path as a `nextFetchTime` cooldown).
    */
  final case class Group(agents: List[String], allow: List[String],
                         disallow: List[String], crawlDelay: Double)

  /** Parse one robots.txt body into its rule groups.
    *
    * RFC 9309 §2.1 grouping: CONSECUTIVE `User-agent` lines form one
    * group sharing the rules that follow — so in
    * `User-agent: a\nUser-agent: *\nDisallow: /x`, `/x` applies to both
    * `a` and `*`. A `User-agent` line only STARTS a new group when
    * non-agent lines came between it and the previous agent line.
    */
  def parseGroups(body: String): List[Group] = {
    final class B {
      val agents = mutable.ListBuffer.empty[String]
      val allow = mutable.ListBuffer.empty[String]
      val dis = mutable.ListBuffer.empty[String]
      var delay = 0.0
    }
    val out = mutable.ListBuffer.empty[B]
    var cur: B = null
    var inAgentRun = false // currently inside a run of User-agent lines
    body.linesIterator.map(_.trim).foreach { line =>
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:")) {
        val agent = lower.substring("user-agent:".length).trim
        if (!inAgentRun) { cur = new B; out += cur }
        if (agent.nonEmpty) cur.agents += agent
        inAgentRun = true
      } else {
        if (line.nonEmpty) inAgentRun = false
        if (cur != null) {
          if (lower.startsWith("disallow:")) {
            val p = line.substring("disallow:".length).trim
            if (p.nonEmpty) cur.dis += p
          } else if (lower.startsWith("allow:")) {
            val p = line.substring("allow:".length).trim
            if (p.nonEmpty) cur.allow += p
          } else if (lower.startsWith("crawl-delay:")) {
            val v = lower.substring("crawl-delay:".length).trim
            try { val d = v.toDouble; if (d > cur.delay) cur.delay = d }
            catch { case _: NumberFormatException => }
          }
        }
      }
    }
    out.map(b => Group(b.agents.toList, b.allow.toList, b.dis.toList, b.delay)).toList
  }

  /** RFC 9309 §2.2.1 group selection for a crawler product token: the
    * MOST SPECIFIC match wins — the longest agent token that is a
    * case-insensitive prefix of `agent`; groups tied at that length
    * merge (same-agent groups combine per the RFC); the `*` group
    * (specificity 0) is the fallback. Returns (encoded rules — `'A'|'D'`
    * + path, sorted by (path length desc, Allow first, path) so
    * first-match-wins evaluation applies §2.2.2 precedence — and the
    * max crawl-delay of the merged groups); no matching group → allow
    * all, no delay.
    */
  def select(groups: Seq[Group], agent: String): (Seq[String], Double) = {
    val a = agent.toLowerCase
    def spec(t: String): Int =
      if (t == "*") 0
      else if (a != "*" && a.startsWith(t)) t.length
      else -1
    var best = -1
    groups.foreach(_.agents.foreach(t => best = math.max(best, spec(t))))
    if (best < 0) (Nil, 0.0)
    else {
      val m = groups.filter(_.agents.exists(t => spec(t) == best))
      val enc = (m.flatMap(_.allow).map("A" + _) ++ m.flatMap(_.disallow).map("D" + _))
        .sortBy(r => (-(r.length - 1), r.charAt(0), r))
      (enc, m.foldLeft(0.0)((d, g) => math.max(d, g.crawlDelay)))
    }
  }

  /** (encoded allow/disallow rules, crawl-delay) for `agent` —
    * parse + select.
    */
  def rulesFor(body: String, agent: String): (Seq[String], Double) =
    select(parseGroups(body), agent)

  /** One rule path against a URL path — RFC 9309 §2.2.3 special
    * characters: `*` matches any run of octets (including none), a
    * TRAILING `$` anchors the rule at the path's end; otherwise the rule
    * matches any path it is a prefix-glob of. Iterative greedy glob with
    * single-star backtracking — no regex, no allocation: this runs once
    * per (rule, discovered link) on the engine's highest-volume stream.
    */
  def pathMatches(rule: String, path: String): Boolean =
    globMatch(rule, 0, path)

  private def globMatch(pat: String, start: Int, path: String): Boolean = {
    var pEnd = pat.length
    val anchored = pEnd > start && pat.charAt(pEnd - 1) == '$'
    if (anchored) pEnd -= 1
    var pi = start; var si = 0
    var starPi = -1; var starSi = 0
    val sLen = path.length
    while (true) {
      if (!anchored && pi == pEnd) return true // rule consumed: prefix hit
      if (si == sLen) {
        while (pi < pEnd && pat.charAt(pi) == '*') pi += 1
        return pi == pEnd
      }
      if (pi < pEnd && pat.charAt(pi) == '*') {
        starPi = pi; pi += 1; starSi = si
      } else if (pi < pEnd && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (starPi >= 0) {
        starSi += 1; pi = starPi + 1; si = starSi
      } else return false
    }
    false
  }

  /** `Sitemap:` directives of a robots.txt body (sitemaps.org
    * extension). GLOBAL per the spec — not scoped to any agent group —
    * so they are collected independently of grouping; line order kept.
    */
  def sitemaps(body: String): List[String] =
    body.linesIterator.map(_.trim)
      .filter(_.toLowerCase.startsWith("sitemap:"))
      .map(_.substring("sitemap:".length).trim)
      .filter(_.nonEmpty)
      .toList

  /** Encoded rules for the `*` agent (compat surface for the
    * truth-table tests and agent-agnostic callers).
    */
  def parse(body: String): Seq[String] = rulesFor(body, "*")._1

  /** URL against one host's encoded rule list (as produced by
    * [[select]]): the list is pre-sorted most-specific-first, so the
    * FIRST matching rule decides — `'D'` ⇒ disallowed, `'A'` ⇒ allowed;
    * no match ⇒ allowed. No regex on this path: it runs once per
    * discovered link (the engine's highest-volume stream), through the
    * memoized [[graft.PyUrl.urlparse]].
    */
  def isDisallowedBy(rules: Seq[String], url: String): Boolean = {
    if (rules == null || rules.isEmpty) return false
    val path = pathOf(url)
    var i = 0
    val n = rules.length
    while (i < n) {
      val r = rules(i)
      val m = r.length
      // fast path: a rule with no '*' and no '$' anchor is a plain prefix
      // probe — one intrinsified scan + regionMatches instead of the
      // interpreted glob loop. This is the overwhelmingly common rule
      // shape and this loop runs once per (rule, discovered link).
      if (r.charAt(m - 1) != '$' && r.indexOf('*', 1) < 0) {
        if (m - 1 <= path.length && path.regionMatches(0, r, 1, m - 1))
          return r.charAt(0) == 'D'
      } else if (globMatch(r, 1, path)) return r.charAt(0) == 'D'
      i += 1
    }
    false
  }

  /** RFC 9309 §2.2.2 match target: the path PLUS the query when present
    * (`?q=` rules must be matchable — the RFC matches against everything
    * after the authority). Fragments are already dropped by urlparse.
    */
  private def pathOf(url: String): String = {
    val p = graft.PyUrl.urlparse(
      if (url.startsWith("http://") || url.startsWith("https://")) url
      else "https://" + url)
    if (p.query.isEmpty) p.path else p.path + "?" + p.query
  }

  /** Static probe target of the codegen'd
    * [[graft.functions.RobotsDisallowedExpr]]: same semantics as
    * [[isDisallowedBy]] over the in-plan `array<string>` encoded-rules
    * column (pre-sorted by [[select]], first match decides). Null rules
    * (host without robots) or null url → allowed. Loops without
    * materializing a Seq — per-link hot path.
    */
  def disallowedArray(rules: org.apache.spark.sql.catalyst.util.ArrayData,
                      url: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    if (rules == null || url == null) return false
    val n = rules.numElements()
    if (n == 0) return false
    val path = pathOf(url.toString)
    // one UTF8String per link (replaces a per-RULE toString: the r4
    // matcher allocated + glob-looped every rule — measured as part of
    // the 2-core per-page regression, VERDICT r4 #2)
    var u8path: org.apache.spark.unsafe.types.UTF8String = null
    var i = 0
    while (i < n) {
      val r = rules.getUTF8String(i)
      if (r != null) {
        val nb = r.numBytes
        // plain-rule fast path: no '*' in the body, no trailing '$' —
        // a raw byte-prefix probe, no String materialization at all
        // (byte-wise UTF-8 prefix equality ≡ char-wise prefix equality)
        var plain = nb > 1 && r.getByte(nb - 1) != '$'
        var j = 1
        while (plain && j < nb) {
          if (r.getByte(j) == '*') plain = false
          j += 1
        }
        if (plain) {
          if (u8path == null)
            u8path = org.apache.spark.unsafe.types.UTF8String.fromString(path)
          if (nb - 1 <= u8path.numBytes && bytePrefixMatches(r, u8path))
            return r.getByte(0) == 'D'
        } else {
          val s = r.toString
          if (globMatch(s, 1, path)) return s.charAt(0) == 'D'
        }
      }
      i += 1
    }
    false
  }

  /** rule bytes [1, numBytes) against the leading bytes of `path`;
    * caller guarantees numBytes − 1 ≤ path.numBytes.
    */
  private def bytePrefixMatches(rule: org.apache.spark.unsafe.types.UTF8String,
                                path: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val len = rule.numBytes - 1
    var j = 0
    while (j < len) {
      if (rule.getByte(j + 1) != path.getByte(j)) return false
      j += 1
    }
    true
  }

  /** rules: host → encoded rule list. URL with unknown host is allowed. */
  def isDisallowed(rules: Map[String, Seq[String]], host: String, url: String): Boolean =
    rules.get(host) match {
      case None => false
      case Some(encoded) => isDisallowedBy(encoded, url)
    }
}
