package graft
package extract

import java.util.regex.Pattern
import scala.collection.mutable

/** Port of newspaperlite's ContentExtractor
  * (/root/reference/newspaperlite/extractors.py) — title (F14), authors
  * (F16), dates (F15), meta helpers (F17), best-node gravity scoring
  * (F10-F12). Pure functions over [[Dom]]; float arithmetic mirrors the
  * Python expressions operation-for-operation.
  */
object Extractors {

  // extractors.py:50-54
  private val DateRegexStr =
    "([\\./\\-_]{0,1}(19|20)\\d{2})[\\./\\-_]{0,1}(([0-3]{0,1}[0-9][\\./\\-_])|(\\w{3,5}[\\./\\-_]))([0-3]{0,1}[0-9][\\./\\-]{0,1})?"
  val StrictDateRegex: Pattern = Pattern.compile(
    "(?<=\\W)" + DateRegexStr, Pattern.UNICODE_CHARACTER_CLASS)

  // ------------------------------------------------------------------
  // title (extractors.py:238-367)
  // ------------------------------------------------------------------

  private val filterRegex = Pattern.compile("[^\\u4e00-\\u9fa5a-zA-Z0-9\\ ]")
  private val splitFilterRegex = Pattern.compile("[^a-zA-Z0-9\\ ]")

  def getTitle(doc: Dom): String = {
    val titleElems = Explorer.getElementsByTagName(doc, tag = "title")
    if (titleElems.isEmpty) return ""
    var titleText = Explorer.getText(titleElems.head)
    var usedDelimiter = false

    var titleTextH1 = ""
    val h1s = Explorer.getElementsByTagName(doc, tag = "h1")
    val h1Texts = h1s.map(Explorer.getText(_)).sortBy(-_.length) // stable: longest first
    if (h1Texts.nonEmpty) {
      titleTextH1 = h1Texts.head
      if (titleTextH1.split(" ", -1).length <= 2) titleTextH1 = ""
      titleTextH1 = titleTextH1.split("\\s+").filter(_.nonEmpty).mkString(" ")
    }

    val titleTextFb = {
      val a = getMetaContent(doc, "meta[property=\"og:title\"]")
      if (a.nonEmpty) a else getMetaContent(doc, "meta[name=\"og:title\"]")
    }

    def filt(s: String): String = filterRegex.matcher(s).replaceAll("").toLowerCase
    val fT = filt(titleText)
    val fH1 = filt(titleTextH1)
    val fFb = filt(titleTextFb)

    if (titleTextH1 == titleText) usedDelimiter = true
    else if (fH1.nonEmpty && fH1 == fFb) { titleText = titleTextH1; usedDelimiter = true }
    else if (fH1.nonEmpty && fT.contains(fH1) && fFb.nonEmpty && fT.contains(fFb) &&
      titleTextH1.length > titleTextFb.length) { titleText = titleTextH1; usedDelimiter = true }
    else if (fFb.nonEmpty && fFb != fT && fT.startsWith(fFb)) {
      titleText = titleTextFb; usedDelimiter = true
    }

    // splitters, in reference order (PIPE/DASH/UNDERSCORE/SLASH/ARROWS)
    val splitters = Seq(
      ("|", "\\|"), ("-", " - "), ("_", "_"), ("/", "/"), (" » ", " » "))
    for ((needle, splitRe) <- splitters if !usedDelimiter) {
      if (titleText.contains(needle)) {
        titleText = splitTitle(titleText, splitRe, titleTextH1)
        usedDelimiter = true
      }
    }

    var title = titleText.replace("�", "") // MOTLEY_REPLACEMENT &#65533;
    val fTitle = filt(title)
    if (fH1 == fTitle) title = titleTextH1
    title
  }

  /** extractors.py:344-367. */
  def splitTitle(title: String, splitRe: String, hint0: String): String = {
    var largeTextLength = 0
    var largeTextIndex = 0
    val pieces = title.split(splitRe, -1)
    val hint =
      if (hint0 != null && hint0.nonEmpty)
        splitFilterRegex.matcher(hint0).replaceAll("").toLowerCase
      else null
    var i = 0
    var break = false
    while (i < pieces.length && !break) {
      val current = pieces(i).trim
      if (hint != null && hint.nonEmpty &&
          splitFilterRegex.matcher(current).replaceAll("").toLowerCase.contains(hint)) {
        largeTextIndex = i; break = true
      } else {
        if (current.length > largeTextLength) {
          largeTextLength = current.length
          largeTextIndex = i
        }
        i += 1
      }
    }
    pieces(largeTextIndex).replace("&raquo;", "»").trim
  }

  // ------------------------------------------------------------------
  // authors (extractors.py:84-172)
  // ------------------------------------------------------------------

  private val digitsRe = Pattern.compile("\\d")
  private val tagRe = Pattern.compile("<[^<]+?>")
  private val byRe = Pattern.compile("[bB][yY][\\:\\s]|[fF]rom[\\:\\s]")
  private val nameTokenSplit = Pattern.compile("[^\\w\\'\\-\\.]", Pattern.UNICODE_CHARACTER_CLASS)

  def parseByline(searchStr0: String): List[String] = {
    var s = tagRe.matcher(searchStr0).replaceAll("")
    s = byRe.matcher(s).replaceAll("")
    s = s.trim
    val nameTokens = nameTokenSplit.split(s, -1).map(_.trim)
    val authors = mutable.ListBuffer.empty[String]
    var curname = mutable.ListBuffer.empty[String]
    val delimiters = Set("and", ",", "")
    for (token <- nameTokens) {
      if (delimiters.contains(token)) {
        if (curname.nonEmpty) { authors += curname.mkString(" "); curname = mutable.ListBuffer.empty }
      } else if (!digitsRe.matcher(token).find()) {
        curname += token
      }
    }
    if (curname.length >= 2) authors += curname.mkString(" ")
    authors.toList
  }

  /** Python str.title(): uppercase letter after any non-alpha. */
  def pyTitleCase(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevAlpha = false
    s.foreach { c =>
      if (Character.isLetter(c)) {
        sb.append(if (prevAlpha) Character.toLowerCase(c) else Character.toUpperCase(c))
        prevAlpha = true
      } else { sb.append(c); prevAlpha = false }
    }
    sb.toString
  }

  def getAuthors(doc: Dom): List[String] = {
    val ATTRS = Seq("name", "rel", "itemprop", "class", "id")
    val VALS = Seq("author", "byline", "dc.creator")
    val matches = mutable.ListBuffer.empty[Dom]
    for (attr <- ATTRS; v <- VALS)
      matches ++= Explorer.getElementsByTagName(doc, attr = attr, value = v)
    val authors = mutable.ListBuffer.empty[String]
    for (m <- matches) {
      val content =
        if (m.tag == "meta") m.attrs.getOrElse("content", "")
        else if (m.text != null) m.text else ""
      if (content.nonEmpty) authors ++= parseByline(content)
    }
    // uniqify preserving order, case-insensitive, .title()
    val seen = mutable.HashSet.empty[String]
    authors.toList.flatMap { a =>
      val k = a.toLowerCase
      if (seen.contains(k)) None else { seen += k; Some(pyTitleCase(a)) }
    }
  }

  // ------------------------------------------------------------------
  // dates (extractors.py:184-236 + utils.py:277-305)
  // ------------------------------------------------------------------

  /** dateutil-equivalent for the forms this pipeline feeds it: full
    * Y[sep]M[sep]D (leading/trailing separators tolerated), ISO
    * datetimes, and plain 'YYYY-M-D'. Returns "%Y-%m-%d %H:%M:%S"
    * (the format the reference persists, utils.py:324-331) or null.
    */
  def parseDateStr(dateStr: String): String = {
    if (dateStr == null || dateStr.isEmpty) return null
    val iso = Pattern.compile(
      "^\\s*(\\d{4})-(\\d{1,2})-(\\d{1,2})[T ](\\d{1,2}):(\\d{2})(?::(\\d{2}))?(?:[.,]\\d+)?(Z|[+-]\\d{2}:?\\d{2})?\\s*$")
      .matcher(dateStr)
    if (iso.matches()) {
      return fmt(iso.group(1).toInt, iso.group(2).toInt, iso.group(3).toInt,
        iso.group(4).toInt, iso.group(5).toInt,
        if (iso.group(6) != null) iso.group(6).toInt else 0)
    }
    val ymd = Pattern.compile(
      "^[\\s\\./\\-_]*((?:19|20)\\d{2})[\\./\\-_]{1}(\\d{1,2})[\\./\\-_]{1}(\\d{1,2})[\\s\\./\\-_]*$")
      .matcher(dateStr)
    if (ymd.matches()) {
      val y = ymd.group(1).toInt; val m = ymd.group(2).toInt; val d = ymd.group(3).toInt
      if (m >= 1 && m <= 12 && d >= 1 && d <= 31) return fmt(y, m, d, 0, 0, 0)
    }
    null
  }

  private def fmt(y: Int, m: Int, d: Int, hh: Int, mm: Int, ss: Int): String =
    f"$y%04d-$m%02d-$d%02d $hh%02d:$mm%02d:$ss%02d"

  /** utils.py:277-292 (Italian-only weekday/month table). */
  private val itMonths = Map("gennaio" -> 1, "gen" -> 1, "febbraio" -> 2,
    "feb" -> 2, "marzo" -> 3, "mar" -> 3, "aprile" -> 4, "apr" -> 4,
    "maggio" -> 5, "mag" -> 5, "giugno" -> 6, "giu" -> 6, "luglio" -> 7,
    "lug" -> 7, "agosto" -> 8, "ago" -> 8, "settembre" -> 9, "set" -> 9,
    "ottobre" -> 10, "ott" -> 10, "novembre" -> 11, "nov" -> 11,
    "dicembre" -> 12, "dic" -> 12)
  private val itWeekdays = Seq("lunedi", "lunedì", "lun", "martedi",
    "martedì", "mar", "mercoledi", "mercoledì", "mer", "giovedi",
    "giovedì", "gio", "venerdi", "venerdì", "ven", "sabato", "sab",
    "domenica", "dom")
  private lazy val itDateRe = Pattern.compile(
    s"(${itWeekdays.mkString("|")})?\\s{1,3}(\\d\\d)\\s{1,3}(${itMonths.keys.mkString("|")})\\s{1,3}(\\d\\d(?:\\d\\d))?",
    Pattern.CASE_INSENSITIVE)

  def getDateFromStringByLanguage(txt: String, language: String): String = {
    if (language == null || !Set("it", "IT", "it-IT").contains(language)) return null
    if (txt == null) return null
    val m = itDateRe.matcher(txt)
    if (m.find()) {
      val day = m.group(2)
      val month = itMonths(m.group(3).toLowerCase)
      val year = m.group(4)
      // reference builds '%s-%s-%s' % (year, month, day) and feeds it to
      // dateutil (utils.py:288-289). The year group is `(\d\d(?:\d\d))?`
      // — the inner (?:\d\d) is NOT optional, so it matches FOUR digits
      // or nothing: a 2-digit year in the text leaves the group None,
      // the built string is "None-M-D", and dateutil raises -> None.
      // (Verified against the reference regex; there is no 2-digit-year
      // path to diverge on — F15 parity is exact here.)
      if (year == null) return null
      parseDateStr(f"${year.toInt}%04d-$month%02d-${day.toInt}%02d")
    } else null
  }

  private val PublishDateTags = Seq(
    ("property", "rnews:datePublished", "content"),
    ("property", "article:published_time", "content"),
    ("name", "OriginalPublicationDate", "content"),
    ("itemprop", "datePublished", "datetime"),
    ("itemprop", "datePublished", "content"),
    ("property", "og:published_time", "content"),
    ("name", "article_date_original", "content"),
    ("name", "publication_date", "content"),
    ("name", "sailthru.date", "content"),
    ("name", "PublishDate", "content"),
    ("pubdate", "pubdate", "datetime"),
    ("itemprop", "dateModified", "content"),
    ("itemprop", "dateModified", "datetime"))

  /** extractors.py:184-236 (including the reference's swapped-args call at
    * line 224, which makes the per-tag Italian fallback inert).
    */
  def getPublishingDate(url: String, doc: Dom, language: String): String = {
    val um = StrictDateRegex.matcher(url)
    if (um.find()) {
      val r = parseDateStr(um.group(0))
      if (r != null) return r
    }
    for ((attr, value, contentAttr) <- PublishDateTags) {
      val tags = Explorer.getElementsByTagName(doc, attr = attr, value = value)
      for (t <- tags) {
        val dateStr = Explorer.getAttribute(t, contentAttr)
        val r = parseDateStr(dateStr)
        if (r != null) return r
        // faithful: utils.get_date_from_string_by_language(self.language, txt)
        // — args swapped in the reference, so this never yields a date for
        // real page text; preserved as a no-op.
      }
    }
    val bodyNode = Explorer.getElementsByTags(doc, Seq("body")).head
    val html = Explorer.getText(bodyNode)
    val bm = StrictDateRegex.matcher(html)
    if (bm.find()) {
      val r = parseDateStr(bm.group(0))
      if (r != null) return r
    }
    // reference line 236: (html, self.language) — correct order here
    getDateFromStringByLanguage(html, language)
  }

  // ------------------------------------------------------------------
  // meta helpers (extractors.py:385-555)
  // ------------------------------------------------------------------

  def getMetaContent(doc: Dom, metaname: String): String = {
    val meta = Explorer.cssSelect(doc, metaname)
    if (meta.nonEmpty) {
      val c = Explorer.getAttribute(meta.head, "content")
      if (c != null && c.trim.nonEmpty) return c.trim
    }
    ""
  }

  def getMetaLang(doc: Dom): String = {
    var attr: String = null
    val og = doc.iter.find(d => d.tag == "meta" &&
      (d.attrs.get("itemprop").contains("inLanguage") ||
       d.attrs.get("property").contains("og:locale")))
    og.foreach(o => attr = Explorer.getAttribute(o, "content"))
    if (attr == null) {
      attr = Explorer.getAttribute(doc, "lang")
      if (attr == null) {
        val items = Seq(("http-equiv", "content-language"), ("name", "lang"))
        var found = false
        for ((a, v) <- items if !found) {
          val meta = Explorer.getElementsByTagName(doc, tag = "meta", attr = a, value = v)
          if (meta.nonEmpty) { attr = Explorer.getAttribute(meta.head, "content"); found = true }
        }
      }
    }
    if (attr != null && attr.length >= 2) {
      val v = attr.substring(0, 2)
      if (v.matches("^[A-Za-z]{2}$")) return v.toLowerCase
    }
    null
  }

  def getFavicon(doc: Dom): String = {
    val meta = Explorer.getElementsByTagName(doc, tag = "link", attr = "rel", value = "icon")
    if (meta.nonEmpty) {
      val f = Explorer.getAttribute(meta.head, "href")
      if (f != null) return f
    }
    ""
  }

  def getMetaType(doc: Dom): String = getMetaContent(doc, "meta[property=\"og:type\"]")
  def getMetaDescription(doc: Dom): String = getMetaContent(doc, "meta[name=description]")
  def getMetaKeywords(doc: Dom): String = getMetaContent(doc, "meta[name=keywords]")

  /** extractors.py:520-555 (canonical link; hostless-path repair). */
  def getCanonicalLink(articleUrl: String, doc: Dom): String = {
    val links = Explorer.getElementsByTagName(doc, tag = "link", attr = "rel", value = "canonical")
    val canonical = if (links.nonEmpty) {
      val h = Explorer.getAttribute(links.head, "href"); if (h == null) "" else h
    } else ""
    val ogUrl = getMetaContent(doc, "meta[property=\"og:url\"]")
    var metaUrl = if (canonical.nonEmpty) canonical else ogUrl
    if (metaUrl.nonEmpty) {
      metaUrl = metaUrl.trim
      val parsedMeta = PyUrl.urlparse(metaUrl)
      if (PyUrl.hostname(metaUrl) == null || parsedMeta.netloc.isEmpty) {
        val articleHost = PyUrl.hostname(articleUrl)
        val scheme = PyUrl.urlparse(articleUrl).scheme
        val m = Pattern.compile(s".*${Pattern.quote(articleHost)}(?=/)/(.*)")
          .matcher(parsedMeta.path)
        val truePath = if (m.matches()) m.group(1) else parsedMeta.path
        metaUrl = s"$scheme://$articleHost/$truePath".replaceAll("//+$", "")
        // urlunparse((scheme, host, true_path, '', '', '')) semantics:
        metaUrl = s"$scheme://$articleHost" +
          (if (truePath.startsWith("/")) truePath else "/" + truePath)
      }
    }
    metaUrl
  }

  def getSections(doc: Dom): List[String] = {
    val tmp = doc.iter.filter(d => d.tag == "meta" &&
      d.attrs.get("itemprop").contains("articleSection")).toList
    if (tmp.nonEmpty) List(Explorer.getAttribute(tmp.head, "content")).filter(_ != null)
    else List.empty
  }

  // ------------------------------------------------------------------
  // best node / gravity (extractors.py:721-1081)
  // ------------------------------------------------------------------

  final case class Scored(node: Dom) {
    // gravity attrs live on the node's attribute map, like the reference
  }

  def getScore(node: Dom): Double = {
    val s = Explorer.getAttribute(node, "gravityScore")
    if (s == null || s.isEmpty) 0.0 else s.toDouble
  }

  private def updateScore(node: Dom, addToScore: Double): Unit = {
    val cur = getScore(node)
    Explorer.setAttribute(node, "gravityScore", pyFloatRepr(cur + addToScore))
  }

  private def updateNodeCount(node: Dom, add: Int): Unit = {
    val s = Explorer.getAttribute(node, "gravityNodes")
    val cur = if (s == null || s.isEmpty) 0 else s.toInt
    Explorer.setAttribute(node, "gravityNodes", (cur + add).toString)
  }

  /** Python str(float) for the score values this pipeline produces
    * (sums of ints and halves — exact binary floats).
    */
  def pyFloatRepr(d: Double): String = {
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e16)
      s"${d.toLong}.0"
    else d.toString
  }

  def isHighlinkDensity(stop: StopWords, e: Dom): Boolean = {
    val links = Explorer.getElementsByTagName(e, tag = "a")
    if (links.isEmpty) return false
    val text = Explorer.getText(e)
    // count of split(" ", -1) tokens that are nonEmpty && all
    // letter-or-digit, without the token array (per-candidate-node path)
    var wordsCount = 0
    locally {
      var i = 0; var run = 0; var alnum = true
      while (i < text.length) {
        val ch = text.charAt(i)
        if (ch == ' ') {
          if (run > 0 && alnum) wordsCount += 1
          run = 0; alnum = true
        } else {
          run += 1
          if (!Character.isLetterOrDigit(ch)) alnum = false
        }
        i += 1
      }
      if (run > 0 && alnum) wordsCount += 1
    }
    if (wordsCount == 0) return true
    val wordsNumber = wordsCount.toDouble
    val linkText = links.map(Explorer.getText(_)).mkString("")
    val numLinkWords = Explorer.countTokens(linkText, 1).toDouble
    val numLinks = links.length.toDouble
    val score = (numLinkWords / wordsNumber) * numLinks
    score >= 1.0
  }

  private def checkNodeText(stop: StopWords, node: Dom): Boolean = {
    val text = Explorer.getText(node)
    val (_, stops) = stop.stopwordCount(text)
    stops > 2 && !isHighlinkDensity(stop, node)
  }

  def nodesToCheck(stop: StopWords, doc: Dom): List[Dom] = {
    var out = List.empty[Dom]
    for (tag <- Seq("p", "pre", "td"))
      out = out ++ Explorer.getElementsByTagName(doc, tag = tag).filter(checkNodeText(stop, _))
    if (out.isEmpty)
      out = Explorer.getElementsByTagName(doc, tag = "span").filter(checkNodeText(stop, _))
    if (out.isEmpty)
      out = doc.iter.filter(d => d.attrs.get("itemprop").exists(_.contains("text")))
        .filter(checkNodeText(stop, _)).toList
    if (out.isEmpty)
      out = Explorer.getElementsByTagName(doc, tag = "div").filter(checkNodeText(stop, _))
    out
  }

  def isBoostable(stop: StopWords, node: Dom): Boolean = {
    var stepsAway = 0
    for (current <- node.precedingSiblings) {
      if (current.tag == "p") {
        if (stepsAway >= 3) return false
        val text = Explorer.getText(current)
        val (_, stops) = stop.stopwordCount(text)
        if (stops > 5) return true
        stepsAway += 1
      }
    }
    false
  }

  /** extractors.py:721-846. Finds the container, scores candidate text
    * nodes into their parents, picks the arg-max parent. Returns a DEEP
    * COPY of the top node (like the reference) — scores remain as
    * attributes on the copy for the formatter pass.
    */
  def calculateBestNode(stop: StopWords, root: Dom): Dom = {
    var doc = root
    // container preference chain (case-SENSITIVE contains, doc order)
    val c1 = root.iter.find { d =>
      d.attrs.get("itemprop").exists(_.contains("articleBody")) ||
      d.attrs.get("id").exists(v => v.contains("article-body") || v.contains("article_body")) ||
      d.attrs.get("class").exists(v => v.contains("article-body") || v.contains("article_body"))
    }
    c1 match {
      case Some(t) => doc = t
      case None =>
        val c2 = root.iter.find(d => d.tag == "article" &&
          (d.attrs.get("itemtype").contains("http://schema.org/Article") ||
           d.attrs.get("itemtype").contains("http://schema.org/NewsArticle")))
        c2 match {
          case Some(t) => doc = t
          case None =>
            val candidates = root.iter.filter { d =>
              (d.tag == "article" && d.attrs.get("id").exists(_.contains("main"))) ||
              // faithful to the missing-'|' in extractors.py:737-738: an
              // article[class~artic] nested under an article[id~artic]
              (d.tag == "article" && d.attrs.get("class").exists(_.contains("artic")) &&
                hasAncestor(d, a => a.tag == "article" && a.attrs.get("id").exists(_.contains("artic")))) ||
              (d.tag == "div" && Seq("class", "id").exists(a => d.attrs.get(a).exists(v =>
                v.contains("bodyNews") || v.contains("bodynews") || v.contains("body-news") ||
                v.contains("body_news") || v.contains("content-artic") ||
                v.contains("article-content")))) ||
              (d.tag == "div" && d.attrs.get("id").exists(_.contains("content-artic")))
            }.toList
            var found = false
            for (t <- candidates if !found) {
              val style = Explorer.getAttribute(t, "style")
              if (style != null && style.indexOf("display") >= 0) {
                val index = style.indexOf("display")
                val sub = style.substring(index)
                val sepIdx = sub.indexOf(';')
                val stylePart = if (sepIdx >= 0) style.substring(index, sepIdx) else sub
                if (!stylePart.contains("none")) { doc = t; found = true }
              } else { doc = t; found = true }
            }
        }
    }

    var nodesWithText = nodesToCheck(stop, doc)
    var nodesNumber = nodesWithText.length
    if (nodesNumber == 0) {
      val textNode = Explorer.getTextWithoutChild(doc)
      val (_, stops) = stop.stopwordCount(textNode)
      if (stops > 2 && !isHighlinkDensity(stop, doc)) {
        nodesWithText = List(doc)
        nodesNumber = 1
      }
    }

    var startingBoost = 1.0
    var cnt = 0
    var i = 0
    val parentNodes = mutable.ListBuffer.empty[Dom]
    val negativeScoring = 0.0
    val bottomNegativescoreNodes = nodesNumber.toDouble * 0.25

    for (node <- nodesWithText) {
      var boostScore = 0.0
      if (isBoostable(stop, node)) {
        if (cnt >= 0) {
          boostScore = (1.0 / startingBoost) * 50
          startingBoost += 1
        }
      }
      if (nodesNumber > 15) {
        if ((nodesNumber - i) <= bottomNegativescoreNodes) {
          val booster = bottomNegativescoreNodes - (nodesNumber - i).toDouble
          boostScore = -math.pow(booster, 2.0)
          val negscore = math.abs(boostScore) + negativeScoring
          if (negscore > 40) boostScore = 5.0
        }
      }
      val textNode = Explorer.getText(node)
      val (_, stops) = stop.stopwordCount(textNode)
      val upscore = (stops + boostScore).toInt // Python int() truncation

      val parentNode = node.parent
      updateScore(parentNode, upscore)
      updateNodeCount(parentNode, 1)
      if (!parentNodes.exists(_ eq parentNode)) parentNodes += parentNode

      val parentParentNode = if (parentNode != null) parentNode.parent else null
      if (parentParentNode != null) {
        updateNodeCount(parentParentNode, 1)
        updateScore(parentParentNode, upscore / 2.0) // Python 3 float division
        if (!parentNodes.exists(_ eq parentParentNode)) parentNodes += parentParentNode
      }
      cnt += 1
      i += 1
    }

    var topNode: Dom = null
    var topNodeScore = 0.0
    for (e <- parentNodes) {
      val score = getScore(e)
      if (score > topNodeScore) { topNode = e; topNodeScore = score }
      if (topNode == null) topNode = e
    }
    if (topNode == null) null else topNode.deepCopy
  }

  private def hasAncestor(d: Dom, pred: Dom => Boolean): Boolean = {
    var p = d.parent
    while (p != null) { if (pred(p)) return true; p = p.parent }
    false
  }

  // extractors.py:877-943
  def getSiblingsScore(stop: StopWords, topNode: Dom): Double = {
    var base = 100000.0
    var paragraphsNumber = 0
    var paragraphsScore = 0.0
    for (node <- Explorer.getElementsByTagName(topNode, tag = "p")) {
      val text = Explorer.getText(node)
      val (_, stops) = stop.stopwordCount(text)
      if (stops > 2 && !isHighlinkDensity(stop, node)) {
        paragraphsNumber += 1
        paragraphsScore += stops
      }
    }
    if (paragraphsNumber > 0) base = paragraphsScore / paragraphsNumber
    base
  }

  def getSiblingsContent(stop: StopWords, currentSibling: Dom,
                         baseline: Double): List[Dom] = {
    if (currentSibling.tag == "p" && Explorer.getText(currentSibling).nonEmpty) {
      val e0 = currentSibling
      if (e0.tail != null && e0.tail.nonEmpty) {
        val c = e0.deepCopy; c.tail = ""; List(c)
      } else List(e0)
    } else {
      val ps = mutable.ListBuffer.empty[Dom]
      for (p <- Explorer.getElementsByTagName(currentSibling, tag = "p")) {
        val text = Explorer.getText(p)
        if (text.nonEmpty) {
          val (_, stops) = stop.stopwordCount(text)
          val paragraphScore = stops.toDouble
          val score = baseline * 0.30
          if (score < paragraphScore && !isHighlinkDensity(stop, p)) {
            val el = new Dom("p"); el.text = text
            ps += el
          }
        }
      }
      ps.toList
    }
  }

  def addSiblings(stop: StopWords, topNode: Dom): Dom = {
    val baseline = getSiblingsScore(stop, topNode)
    for (current <- topNode.precedingSiblings) {
      val ps = getSiblingsContent(stop, current, baseline)
      for (p <- ps) topNode.insert(0, p)
    }
    topNode
  }

  /** extractors.py:1071-1081. The high-link-density child "removal" is a
    * no-op in the reference (TreeExplorer.remove default) — preserved.
    */
  def postCleanup(stop: StopWords, topNode: Dom): Dom = {
    val node = addSiblings(stop, topNode)
    for (e <- node.children.toList) {
      if (e.tag != "p") {
        if (isHighlinkDensity(stop, e)) Explorer.remove(e) // faithful no-op
      }
    }
    node
  }
}
