package graft
package operators

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Third-party-resource pipeline (S5/J3/J4/J6 in SURVEY.md §2): the
  * table-world counterpart of the reference's HAR capture + EasyList ad
  * classification.
  *
  *  - [[harvestResources]] — per-page third-party resource URLs with the
  *    reference's filters (valid, cross-domain, filetype and social-domain
  *    blocklists — /root/reference/browsing_tools/custom_webbrowser.py:
  *    171-196). Source here is the page DOM's resource attributes
  *    (img/script/iframe/source src, stylesheet href) instead of devtools
  *    network logs (browser-only).
  *  - [[resourceEdges]] — page↔resource M:N edge table + distinct
  *    resource dimension (the INSERT-missing + re-select id resolution,
  *    storage_tools/datacollector.py:313-356, as an anti-join-free
  *    distinct + xxhash64 key: stable ids without an autoincrement).
  *  - [[AdRules]] + [[classifyResources]] — Adblock-filter matching
  *    (extraction_tools/ads_extractor.py:6-32) as a broadcast compiled
  *    rule set over the resource dim; the reference polls batches of 100
  *    from SQLite — here one codegen-friendly pass marks every resource.
  *
  * Scale: edges shuffle on the 8-byte resource key only; the rule
  * automaton is broadcast once (EasyList ~100k rules compile to a few MB
  * of regex state); classification is a map-side scan of the resource
  * dim — never a join against the rule table.
  */
object Resources {

  private val SocialDomains = Set("facebook.com", "facebook.it",
    "youtube.it", "youtube.com", "twitter.it", "twitter.com")
  private val DropFiletypes = Set("jpg", "png", "jpeg")

  /** get_har FILTER semantics (custom_webbrowser.py:171-196) over raw
    * resource-attribute urls: valid URL ∧ NOT same-domain ∧ filetype ∉
    * {jpg,png,jpeg} ∧ domain ∉ social blocklist; set-dedup, order kept.
    * The candidate WALK lives in the extract layer
    * ([[graft.extract.ArticleExtractor.collectResourceCandidates]]) so a
    * page the extractor already parsed yields its resources from that
    * same parse (PageParse.Parsed.resources) — harvest never re-parses.
    */
  def filterThirdParty(candidates: List[String], pageUrl: String): List[String] = {
    val domain = UrlOps.getDomain(pageUrl)
    val urls = scala.collection.mutable.LinkedHashSet.empty[String]
    for (href <- candidates if UrlOps.isValidUrl(href)) {
      val crossDomain = domain == null || !UrlOps.isDomainLink(href, domain)
      val ft = UrlOps.getFiletypeFromUrl(href)
      if (crossDomain && (ft == null || !DropFiletypes.contains(ft)) &&
          !SocialDomains.exists(d => UrlOps.isDomainLink(href, d)))
        urls += href
    }
    urls.toList
  }

  /** Standalone harvest from raw html (one parse). Pipelines that run the
    * extractor should read `PageParse.Parsed.resources` instead — zero
    * extra parses there.
    */
  def harvestResources(html: String, pageUrl: String): List[String] =
    try {
      val collapsed = html.split("\\s+").filter(_.nonEmpty).mkString(" ")
      val tree = graft.extract.Dom.parse(collapsed)
      filterThirdParty(
        graft.extract.ArticleExtractor.collectResourceCandidates(tree), pageUrl)
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** J3/J4 — page↔resource edge table from a pages DataFrame with
    * (url, html). Returns (pageKey, resKey, resUrl) edges, deduped; the
    * distinct resource dim is `edges.select(resKey, resUrl).distinct`.
    */
  def resourceEdges(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val harvest = udf((html: Array[Byte], url: String) =>
      if (html == null) Seq.empty[String]
      else harvestResources(new String(html, "UTF-8"), url))
    pages
      .select(xxhash64(col(urlCol)).as("pageKey"),
        explode(harvest(col(htmlCol), col(urlCol))).as("resUrl"))
      .withColumn("resKey", xxhash64(col("resUrl")))
      .dropDuplicates("pageKey", "resKey")
  }

  /** classify a resource dim (resUrl column) with broadcast compiled
    * rules → adds `is_advertising` (J6).
    */
  def classifyResources(resources: DataFrame, urlCol: String,
                        rules: AdRules): DataFrame = {
    val spark = resources.sparkSession
    val bc = spark.sparkContext.broadcast(rules)
    val isAd = udf((u: String) => bc.value.isAd(u))
    resources.withColumn("is_advertising", isAd(col(urlCol)))
  }
}

/** Adblock-filter subset matcher with adblockparser's documented rule →
  * regex translation (the reference loads EasyList Italy through
  * adblockparser, ads_extractor.py:25-32):
  *   - `!…` comments and option-carrying rules (`…$third-party`) are
  *     skipped — the reference calls `should_block(url)` with no usable
  *     options (mark_ads passes domain='', datacollector.py:270);
  *   - `@@…` exception rules override block rules;
  *   - `||` host anchor, `|` start/end anchors, `*` wildcard, `^`
  *     separator translate exactly as adblockparser does.
  * Serializable: compiled once, broadcast to executors.
  */
final class AdRules(ruleLines: Seq[String]) extends Serializable {

  @transient private lazy val (blockRules, exceptRules) = AdRules.compile(ruleLines)

  def isAd(url: String): Boolean = {
    if (url == null || url.isEmpty) return false
    if (!blockRules.exists(_.matcher(url).find())) return false
    !exceptRules.exists(_.matcher(url).find())
  }
}

object AdRules {
  def apply(ruleLines: Seq[String]): AdRules = new AdRules(ruleLines)

  private[operators] def compile(lines: Seq[String]): (Seq[Pattern], Seq[Pattern]) = {
    val block = Seq.newBuilder[Pattern]
    val except = Seq.newBuilder[Pattern]
    for (raw <- lines) {
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("!") && !line.contains("##") &&
          !line.contains("$")) {
        val (isException, rule) =
          if (line.startsWith("@@")) (true, line.drop(2)) else (false, line)
        val p = Pattern.compile(ruleToRegex(rule))
        if (isException) except += p else block += p
      }
    }
    (block.result(), except.result())
  }

  /** adblockparser's rule_to_regex translation (public algorithm). */
  private[operators] def ruleToRegex(rule0: String): String = {
    var rule = rule0
    val sb = new StringBuilder
    var prefix = ""
    var suffix = ""
    if (rule.startsWith("||")) {
      prefix = "^(?:[^:/?#]+:)?(?://(?:[^/?#]*\\.)?)?"
      rule = rule.drop(2)
    } else if (rule.startsWith("|")) {
      prefix = "^"
      rule = rule.drop(1)
    }
    if (rule.endsWith("|")) {
      suffix = "$"
      rule = rule.dropRight(1)
    }
    rule.foreach {
      case '*' => sb.append(".*")
      case '^' => sb.append("(?:[^\\w\\d_~.%-]|$)")
      case c if "\\.[]{}()+-?$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    prefix + sb.toString + suffix
  }
}
