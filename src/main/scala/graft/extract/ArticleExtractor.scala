package graft
package extract

import scala.collection.mutable

/** The full extraction pipeline: port of ContentExtractor
  * (/root/reference/extraction_tools/extractor.py:49-110) orchestrating
  * Article.parse (/root/reference/newspaperlite/article.py:115-170).
  *
  * Observable pipeline (after accounting for the reference's no-op
  * removals, see [[Explorer.remove]]):
  *   1. whitespace-collapse raw html (F1)            extractor.py:242-243
  *   2. parse (comments removed)                     extractor.py:46,62
  *   3. language from <html lang>/meta (F2)          extractor.py:379-386
  *   4. webnews from schema.org/og meta (F3)         extractor.py:388-395
  *   5. fix relative hrefs (F4)                      extractor.py:251-262
  *   6. harvest same-domain links (F5)               extractor.py:264-282
  *   7. drop text-format tags; pop script/noscript/
  *      style (real removals w/ tail merge) (F6)     extractor.py:245-248,160-174
  *   8. [fidelity] NavHunter analysis on a copy (F8) — result discarded,
  *      exactly like the reference's no-op apply     extractor.py:103-107
  *   9. Article.parse: title/authors/meta/date, gravity best-node,
  *      formatter → byte-identical text (F10-F21)
  *
  * Divergences (documented, reference-offline-equivalent):
  *   - langdetect-on-title is a no-op stub (fires only when <html lang>
  *     and lang metas are all absent);
  *   - top image comes from the meta cascade only — the first-img/Reddit
  *     fallbacks require network fetches that fail offline in the
  *     reference too (images.py:221-225);
  *   - _checking_ids_tree's random bookkeeping ids are skipped (they
  *     never reach any output or selector).
  */
object ArticleExtractor {

  case class Extracted(
      title: String,
      text: String,
      language: String,
      publishDate: String,
      authors: List[String],
      videos: List[String],
      sections: List[String],
      topImage: String,
      canonicalLink: String,
      isNewsMeta: Boolean,
      inLinks: List[String],
      feedLinks: List[String],
      /** RAW resource-attribute urls (img/script/iframe/source/embed src,
        * stylesheet href) in document order, collected from the SAME
        * parse — so a HAR-style harvest (S5) never re-parses a page the
        * extractor already parsed. Filtering (cross-domain, filetype,
        * social blocklist) is the consumer's job
        * ([[graft.operators.Resources.filterThirdParty]]).
        */
      resourceLinks: List[String])

  private val TextFormatTags = Seq("b", "strong", "i", "em", "mark",
    "small", "del", "ins", "sub", "sup") // extractor.py:26

  /** extractor.py:49-71 + 73-90. `isWebnews` is the frontier priority bit
    * the crawler passes through (crawler.py:129-143).
    */
  def extract(htmlBytes: Array[Byte], url0: String, domain: String,
              isWebnews: Boolean, analyzeNav: Boolean = false): Extracted = {
    val raw = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
    extractStr(raw, url0, domain, isWebnews, analyzeNav)
  }

  def extractStr(rawHtml: String, url0: String, domain: String,
                 isWebnews: Boolean, analyzeNav: Boolean = false): Extracted = {
    // prepare_html_tree: url trailing-/ and filetype strip
    var url = if (url0.endsWith("/")) url0.dropRight(1) else url0
    val filetype = UrlOps.getFiletypeFromUrl(url)
    if (filetype != null) url = url.substring(0, url.length - (filetype.length + 1))
    val scheme = UrlOps.getScheme(url)

    // F1: whitespace collapse — one pass, byte-identical to
    // split("\\s+").filter(_.nonEmpty).mkString(" ") (regex \s is the
    // six ASCII whitespace chars) without the per-page token array
    val htmlSource = collapseWhitespace(rawHtml)
    val tree = Dom.parse(htmlSource)
    val body = Explorer.getElementsByTags(tree, Seq("body")).head

    // S5 resource candidates: harvested NOW — before F4 rewrites hrefs
    // and _last_clean pops script/style nodes — so the result is
    // identical to a standalone walk of the freshly-parsed tree
    val resourceLinks = collectResourceCandidates(tree)

    // F2 (extractor.py:379-386)
    var language: String = {
      val htmlTag = if (tree.tag == "html") tree
        else tree.iter.find(_.tag == "html").orNull
      var r = if (htmlTag != null) Explorer.getAttribute(htmlTag, "lang") else null
      if (r == null) {
        val metas = tree.iter.filter(d => d.tag == "meta" &&
          (d.attrs.get("http-equiv").contains("content-language") ||
           d.attrs.get("name").contains("language"))).toList
        if (metas.nonEmpty) r = Explorer.getAttribute(metas.head, "content")
      }
      r
    }

    // F3 (extractor.py:388-395)
    val isNewsMeta = tree.iter.exists(d =>
      d.attrs.get("itemtype").contains("http://schema.org/NewsArticle") ||
      d.attrs.get("itemtype").contains("http://schema.org/Article") ||
      (d.tag == "meta" && d.attrs.get("property").contains("og:type") &&
        d.attrs.get("content").contains("article")))

    // F4 (extractor.py:251-262): body-scope; domain = scheme://hostname
    val hostWww = PyUrl.hostname(url)
    for (e <- body.iter.toList) {
      val href = e.attrs.getOrElse("href", null)
      if (href != null && href.startsWith("/")) {
        if (href.startsWith("//")) e.attrs("href") = scheme + ":" + href
        else e.attrs("href") = scheme + "://" + hostWww + href
      }
    }

    // F5 (extractor.py:268-282): ordered dedup of clean navigable links
    val inLinks: List[String] = {
      val seen = mutable.LinkedHashSet.empty[String]
      for (a <- body.iter if a.tag == "a") {
        val href = a.attrs.getOrElse("href", null)
        if (href != null && domain != null && href.contains(domain)) {
          val cleaned = UrlOps.cleanUrl(href, removeArguments = false,
            domain = domain, scheme = scheme)
          if (UrlOps.isValidUrlToNavigate(cleaned) &&
              UrlOps.isDomainLink(cleaned, domain))
            seen += cleaned
        }
      }
      seen.toList
    }

    // S8 — feed discovery on the already-parsed tree (the reference runs
    // the same cascade from RssFinder at crawl start,
    // extraction_tools/rss_finder.py:12-39 + extractor.py:136-158; in
    // the table world discovered feed urls simply join the frontier).
    // Feeds bypass the navigability filetype filter — the reference
    // fetches them outside page navigation — but stay intra-domain.
    val feedLinks: List[String] = {
      val seen = mutable.LinkedHashSet.empty[String]
      for ((href, _) <- RssDiscovery.extractFeeds(tree, url)) {
        if (href != null && href.nonEmpty) {
          val cleaned = UrlOps.cleanUrl(urljoin(url, href),
            removeArguments = false)
          if (UrlOps.isValidUrl(cleaned) && domain != null &&
              UrlOps.isDomainLink(cleaned, domain))
            seen += cleaned
        }
      }
      seen.toList
    }

    // language normalize (extract_content, extractor.py:75-76)
    if (language != null && language.length >= 2)
      language = language.substring(0, 2).toLowerCase

    val runArticle = isWebnews || isNewsMeta || NewsUrl.isNewsUrl(url)
    if (!runArticle)
      return Extracted(null, "", language, null, Nil, Nil, Nil, "", "",
        isNewsMeta, inLinks, feedLinks, resourceLinks)

    // ---- _last_clean (extractor.py:92-111) ----
    for (e <- Explorer.getElementsByTags(body, TextFormatTags)) e.dropTag()
    for (e <- tree.iter.filter(d => d.tag == "script" || d.tag == "noscript").toList)
      Explorer.remove(e, removeTail = true)
    for (e <- tree.iter.filter(_.tag == "style").toList)
      Explorer.remove(e, removeTail = true)
    if (analyzeNav) {
      // faithful: candidates computed on a deepcopy, apply is a no-op
      NavHunter.findCandidates(tree.deepCopy)
    }

    // ---- Article.parse (article.py:115-170) ----
    var extractorLang = "it" // ContentExtractor default (extractors.py:58)
    var metaLang: String = null
    if (language != null && language.length >= 2)
      metaLang = language.substring(0, 2).toLowerCase
    // update_language(meta_lang) iff the stopword file exists
    if (metaLang != null && StopWords.available(metaLang)) extractorLang = metaLang
    var stop = new StopWords(extractorLang)

    // All metadata getters are PURE READS (no tree mutation), so they
    // run against the cleaned tree directly — BEFORE the gravity scorer
    // and post-cleanup mutate it. The reference protects these reads
    // with a full deepcopy (article.py:117); the read-before-mutate
    // ordering gives byte-identical results (asserted per WebGen
    // template + 17 fixtures) without the copy — the parse path
    // allocates GB/s at crawl scale and the two per-page tree copies
    // were its largest single source.
    var title = Extractors.getTitle(tree)
    // F2 fallback (article.py:125-130): every lang meta absent → detect
    // the language from the title. The reference calls statistical
    // langdetect (utils.py:307-315); this engine uses the deterministic
    // TextOps.langId heuristic — a DOCUMENTED divergence (same trigger,
    // same adoption rule, different classifier). Adopted only when the
    // stopword file exists (update_language, extractors.py:64-77), and
    // BEFORE date/best-node extraction, like the reference's
    // update_language-before-calculate_best_node ordering.
    if (metaLang == null && title != null && title.nonEmpty) {
      val det = graft.functions.TextOps.langId(title)
      if (det != "und" && StopWords.available(det)) {
        metaLang = det
        extractorLang = det
        stop = new StopWords(det)
      }
    }
    val authors = Extractors.getAuthors(tree)
    val canonical = Extractors.getCanonicalLink(url, tree)
    val publishDate = Extractors.getPublishingDate(url, tree, extractorLang)
    val metaImg = metaImgUrl(url, tree)
    val sections = Extractors.getSections(tree)

    val topNode = Extractors.calculateBestNode(stop, tree)
    var text = ""
    var videos: List[String] = Nil
    if (topNode != null) {
      videos = Videos.getVideos(topNode, url)
      val cleaned = Extractors.postCleanup(stop, topNode)
      // nothing reads the tree after formatting: mutate in place
      text = OutputFormatter.getFormatted(cleaned)
    }

    Extracted(
      title = if (title != null && title.nonEmpty) title else null,
      text = text,
      language = metaLang,
      publishDate = publishDate,
      authors = authors,
      videos = videos,
      sections = sections,
      topImage = metaImg,
      canonicalLink = canonical,
      isNewsMeta = isNewsMeta,
      inLinks = inLinks,
      feedLinks = feedLinks,
      resourceLinks = resourceLinks)
  }

  private val ResAttrByTag = Map(
    "img" -> "src", "script" -> "src", "iframe" -> "src",
    "source" -> "src", "embed" -> "src")

  /** Document-order resource-attribute urls of a parsed tree (S5 source
    * set — custom_webbrowser.py:171-196's network log, table-world).
    * Shared by the fused extract path above and the standalone
    * [[graft.operators.Resources.harvestResources]] so both walk the
    * same definition.
    */
  /** Java-regex `\s` (the six ASCII whitespace chars — no Unicode
    * classes without the UNICODE_CHARACTER_CLASS flag).
    */
  private def isRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Single-pass equivalent of
    * `s.split("\\s+").filter(_.nonEmpty).mkString(" ")`: maximal
    * non-whitespace runs joined by one space, leading/trailing
    * whitespace dropped.
    */
  private def collapseWhitespace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isRegexSpace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def collectResourceCandidates(tree: Dom): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    for (e <- tree.iter) {
      val attr = ResAttrByTag.get(e.tag).orNull
      val href =
        if (attr != null) e.attrs.getOrElse(attr, null)
        else if (e.tag == "link" &&
          e.attrs.get("rel").contains("stylesheet")) e.attrs.getOrElse("href", null)
        else null
      if (href != null) out += href
    }
    out.toList
  }

  /** extractors.py:441-464 meta cascade + urljoin(article_url, img). */
  private def metaImgUrl(articleUrl: String, doc: Dom): String = {
    var img = Extractors.getMetaContent(doc, "meta[property=\"og:image\"]")
    if (img.isEmpty) {
      val linkImg = Explorer.getElementsByTagName(doc, tag = "link",
        attr = "rel", value = "img_src|image_src", useRegex = true)
      if (linkImg.nonEmpty) img = Option(linkImg.head.attrs.getOrElse("href", null)).getOrElse("")
      if (img.isEmpty) {
        img = Extractors.getMetaContent(doc, "meta[name=\"og:image\"]")
        if (img.isEmpty) {
          val icons = Explorer.getElementsByTagName(doc, tag = "link",
            attr = "rel", value = "icon")
          if (icons.nonEmpty) img = Option(icons.head.attrs.getOrElse("href", null)).getOrElse("")
        }
      }
    }
    if (img.nonEmpty) urljoin(articleUrl, img) else ""
  }

  /** urllib.parse.urljoin subset: absolute stays; //x gets scheme; /x is
    * host-rooted; relative resolves against the url's directory.
    */
  def urljoin(base: String, url: String): String = {
    if (url.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")) return url
    val scheme = UrlOps.getScheme(base)
    if (url.startsWith("//")) return scheme + ":" + url
    val host = PyUrl.hostname(base)
    if (url.startsWith("/")) return s"$scheme://$host$url"
    val path = PyUrl.urlparse(base).path
    val dir = if (path.contains('/')) path.substring(0, path.lastIndexOf('/') + 1) else "/"
    s"$scheme://$host$dir$url"
  }
}

/** RSS discovery (S8, /root/reference/extraction_tools/extractor.py:
  * 114-158): feed link candidates from a parsed page — `<link
  * type=application/rss+xml|atom+xml rel=alternate>` first, then .xml
  * anchors, then rss/feed-path anchors. Network feed PARSING stays out of
  * scope (feedparser is a network consumer); discovery is the relational
  * part and feeds union into the frontier as a side source.
  */
object RssDiscovery {

  /** extract_feed_rss (extractor.py:136-158) → (href, title) map order. */
  def extractFeeds(tree: Dom, pageUrl: String): List[(String, String)] = {
    val feeds = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val links = tree.iter.filter(d => d.tag == "link" &&
      d.attrs.get("rel").contains("alternate") &&
      (d.attrs.get("type").contains("application/rss+xml") ||
       d.attrs.get("type").contains("application/atom+xml"))).toList
    for (t <- links) {
      val href = Explorer.getAttribute(t, "href")
      if (href != null) feeds(href) = Option(Explorer.getAttribute(t, "title")).getOrElse("")
    }
    if (feeds.isEmpty) {
      for (a <- tree.iter if a.tag == "a") {
        val href = a.attrs.getOrElse("href", null)
        if (href != null && href.contains(".xml") &&
            UrlOps.getFiletypeFromUrl(href) == "xml")
          feeds(href) = ""
      }
    }
    if (feeds.isEmpty) {
      for (a <- tree.iter if a.tag == "a") {
        val href = a.attrs.getOrElse("href", null)
        if (href != null && (href.contains("rss") || href.contains("feed"))) {
          if (!UrlOps.isValidUrl(href)) {
            val finalUrl = s"$pageUrl/$href"
            if (UrlOps.isValidUrl(finalUrl)) feeds(finalUrl) = ""
          } else if (!UrlOps.areEqualsUrls(href, pageUrl)) feeds(href) = ""
        }
      }
    }
    feeds.toList
  }
}

/** Port of VideoExtractor (/root/reference/newspaperlite/videos/
  * extractors.py:9-133) — provider allow-list over iframe/embed/object/
  * video candidates under the top node.
  */
object Videos {
  private val Providers = Seq("youtube", "vimeo", "dailymotion", "kewego", "facebook")

  def getVideos(topNode: Dom, url: String): List[String] = {
    val domainUrl = if (url != null) UrlOps.getPrincipalDomain(url) else null
    def provider(src: String): String = {
      if (src != null && domainUrl != null && src.contains(domainUrl)) return domainUrl
      if (src != null) Providers.find(src.contains).orNull else null
    }
    // document order; get_object_tag removes a child embed from the
    // candidate list so it isn't parsed twice (videos/extractors.py:80-85)
    val candidates = mutable.ListBuffer.empty[Dom]
    candidates ++= Explorer.getElementsByTags(topNode, Seq("iframe", "embed", "object", "video"))
    val skipped = mutable.Set.empty[Dom]
    val movies = mutable.ListBuffer.empty[String]
    for (c <- candidates.toList if !skipped.exists(_ eq c)) {
      c.tag match {
        case "iframe" =>
          val src = Explorer.getAttribute(c, "src")
          if (provider(src) != null && src != null) movies += src
        case "embed" =>
          val parent = c.parent
          if (parent != null && parent.tag == "object")
            objectTag(parent, skipped, provider).foreach(movies += _)
          else {
            val src = Explorer.getAttribute(c, "src")
            if (provider(src) != null && src != null) movies += src
          }
        case "object" =>
          objectTag(c, skipped, provider).foreach(movies += _)
        case _ => () // 'video' tag: reference returns an empty Video (no src)
      }
    }
    movies.toList
  }

  private def objectTag(node: Dom, skipped: mutable.Set[Dom],
                        provider: String => String): Option[String] = {
    val childEmbeds = Explorer.getElementsByTagName(node, tag = "embed")
    if (childEmbeds.nonEmpty) skipped += childEmbeds.head
    val srcNode = Explorer.getElementsByTagName(node, tag = "param",
      attr = "name", value = "movie")
    if (srcNode.isEmpty) return None
    val src = Explorer.getAttribute(srcNode.head, "value")
    if (provider(src) == null) return None
    Option(src)
  }
}
