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
  * robots.txt; see SURVEY.md §7.1 note). Minimal `User-agent: *` prefix
  * semantics: a URL is disallowed iff its path starts with any Disallow
  * prefix of its host. Empty `Disallow:` lines allow all.
  */
object Robots {

  /** Parse one robots.txt body → disallow path-prefixes for `*` agent.
    *
    * RFC 9309 §2.1 grouping: CONSECUTIVE `User-agent` lines form one
    * group sharing the rules that follow — so in
    * `User-agent: a\nUser-agent: *\nDisallow: /x`, `/x` applies to `*`.
    * A `User-agent` line only RESETS the group when rule lines came
    * between it and the previous agent line.
    */
  def parse(body: String): Seq[String] = {
    var inStar = false
    var inAgentRun = false // currently inside a run of User-agent lines
    val out = mutable.ListBuffer.empty[String]
    body.linesIterator.map(_.trim).foreach { line =>
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:")) {
        val agent = line.substring("user-agent:".length).trim
        // first agent line after rules starts a NEW group; later lines
        // of the same run widen the group
        if (inAgentRun) inStar ||= agent == "*"
        else inStar = agent == "*"
        inAgentRun = true
      } else {
        if (line.nonEmpty) inAgentRun = false
        if (inStar && lower.startsWith("disallow:")) {
          val p = line.substring("disallow:".length).trim
          if (p.nonEmpty) out += p
        }
      }
    }
    out.toList
  }

  /** URL path against one host's disallow prefixes. */
  def isDisallowedBy(prefixes: Seq[String], url: String): Boolean = {
    val path = graft.PyUrl.urlparse(
      if (url.matches("^https?://.*")) url else "https://" + url).path
    prefixes.exists(path.startsWith)
  }

  /** rules: host → disallow prefixes. URL with unknown host is allowed. */
  def isDisallowed(rules: Map[String, Seq[String]], host: String, url: String): Boolean =
    rules.get(host) match {
      case None => false
      case Some(prefixes) => isDisallowedBy(prefixes, url)
    }
}
