package graft
package crawl

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern
import scala.collection.mutable

/** v1 page parsing: title / article text / link harvest over the synthetic
  * page corpus. Deterministic and shared verbatim by the Spark engine and
  * the sequential RefSpec oracle, so crawl-equivalence tests compare
  * SCHEDULING, not parsing.
  *
  * Link-harvest semantics mirror the reference extractor
  * (/root/reference/extraction_tools/extractor.py:251-282): fix relative
  * hrefs (F4), keep same-domain anchors (P6), clean (P1), navigability
  * gate (P5), order-preserving dedup (dict-keys trick). The full
  * boilerplate/gravity extraction port (F6-F21) replaces `title`/`text`
  * in the extractor phase; link harvest stays as defined here.
  */
object PageParse {

  case class Parsed(title: String, text: String, links: List[String],
                    isWebnewsMeta: Boolean)

  private val titleRe = Pattern.compile("<title>(.*?)</title>", Pattern.DOTALL)
  private val paraRe = Pattern.compile("<p>(.*?)</p>", Pattern.DOTALL)
  private val hrefRe = Pattern.compile("href=\"([^\"]*)\"")

  /** extractor.py:251-262 — relative-href fixing. */
  def fixHref(href: String, scheme: String, host: String): String =
    if (href.startsWith("//")) scheme + ":" + href
    else if (href.startsWith("/")) scheme + "://" + host + href
    else href

  def parse(htmlBytes: Array[Byte], url: String): Parsed = {
    val html = new String(htmlBytes, StandardCharsets.UTF_8)
    val domain = UrlOps.getPrincipalDomain(url)
    val scheme = Option(UrlOps.getScheme(url)).getOrElse("https")
    val hostFull = graft.PyUrl.hostname(url)

    val tm = titleRe.matcher(html)
    val title = if (tm.find()) tm.group(1) else ""

    val pm = paraRe.matcher(html)
    val paras = mutable.ListBuffer.empty[String]
    while (pm.find()) paras += pm.group(1)
    val text = paras.mkString("\n\n")

    val hm = hrefRe.matcher(html)
    val seen = mutable.LinkedHashSet.empty[String] // order-preserving dedup
    while (hm.find()) {
      val fixed = fixHref(hm.group(1), scheme, hostFull)
      if (domain != null && UrlOps.isDomainLink(fixed, domain)) {
        val cleaned = UrlOps.cleanUrl(fixed)
        if (cleaned != null && UrlOps.isValidUrlToNavigate(cleaned))
          seen += cleaned
      }
    }
    Parsed(title, text, seen.toList, isWebnewsMeta = false)
  }
}

/** robots.txt rules (a NEW-engine requirement — the reference never reads
  * robots.txt; see SURVEY.md §7.1 note). Minimal `User-agent: *` prefix
  * semantics: a URL is disallowed iff its path starts with any Disallow
  * prefix of its host. Empty `Disallow:` lines allow all.
  */
object Robots {

  /** Parse one robots.txt body → disallow path-prefixes for `*` agent. */
  def parse(body: String): Seq[String] = {
    var inStar = false
    val out = mutable.ListBuffer.empty[String]
    body.linesIterator.map(_.trim).foreach { line =>
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:"))
        inStar = line.substring("user-agent:".length).trim == "*"
      else if (inStar && lower.startsWith("disallow:")) {
        val p = line.substring("disallow:".length).trim
        if (p.nonEmpty) out += p
      }
    }
    out.toList
  }

  /** rules: host → disallow prefixes. URL with unknown host is allowed. */
  def isDisallowed(rules: Map[String, Seq[String]], host: String, url: String): Boolean =
    rules.get(host) match {
      case None => false
      case Some(prefixes) =>
        val path = graft.PyUrl.urlparse(
          if (url.matches("^https?://.*")) url else "https://" + url).path
        prefixes.exists(path.startsWith)
    }
}
