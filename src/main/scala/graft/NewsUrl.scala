package graft

import java.util.regex.Pattern

/** URL-shape news classifier, ported 1:1 from
  * /root/reference/newspaperlite/newsurl.py:26-122. Drives the
  * `is_webnews` priority bit that orders the crawl
  * (/root/reference/storage_tools/datacollector.py:171-177), so branch
  * behavior must match exactly.
  */
object NewsUrl {

  /** newsurl.py:6-7 (note: unlike utils.py:18, no `php`/`xml`). */
  val AllowedTypes: Set[String] = Set(
    "html", "htm", "md", "rst", "aspx", "jsp", "rhtml", "cgi",
    "xhtml", "jhtml", "asp", "shtml")

  /** newsurl.py:9-11 */
  val GoodPaths: Seq[String] = Seq(
    "story", "article", "feature", "featured", "slides",
    "slideshow", "gallery", "news", "video", "media",
    "v", "radio", "press")

  /** newsurl.py:13-15 */
  val BadChunks: Seq[String] = Seq(
    "careers", "contact", "about", "faq", "terms", "privacy",
    "advert", "preferences", "feedback", "info", "browse", "howto",
    "account", "subscribe", "donate", "shop", "admin", "cookies", "disclaimer")

  /** newsurl.py:17 */
  val BadDomains: Set[String] = Set("amazon", "doubleclick", "twitter", "shop")

  /** newsurl.py:21 — the date regex searched over the whole URL. */
  val DateRegex: Pattern = Pattern.compile(
    "([\\./\\-_]{0,1}(19|20)\\d{2})[\\./\\-_]{0,1}(([0-3]{0,1}[0-9][\\./\\-_])|(\\w{3,5}[\\./\\-_]))([0-3]{0,1}[0-9][\\./\\-]{0,1})?")

  // per-link hot path: hoisted pattern (String.split("\\.") compiles a
  // regex per call), array copies of the token lists for iterator-free
  // index loops, goods pre-lowercased into a set
  private val dotSplit = Pattern.compile("\\.")
  // per-thread reusable matcher (per-link predicate; Matcher isn't thread-safe)
  private val dateMatcher = new ThreadLocal[java.util.regex.Matcher] {
    override def initialValue() = DateRegex.matcher("")
  }
  private val badChunksArr: Array[String] = BadChunks.toArray
  private val goodPathsLower: Set[String] = GoodPaths.map(_.toLowerCase).toSet

  /** newsurl.py:103-122 — like UrlOps.getFiletypeFromUrl but also accepts
    * long extensions that are in AllowedTypes, and returns null when the
    * path has no chunks (reference raises IndexError there; callers only
    * reach it with ≥1 chunk).
    */
  def urlToFiletype(absUrl: String): String = {
    var path = PyUrl.urlparse(absUrl).path
    if (path.endsWith("/")) path = path.substring(0, path.length - 1)
    var end = path.length
    while (end > 0 && path.charAt(end - 1) == '/') end -= 1
    if (end == 0) return null
    val chunk = path.substring(path.lastIndexOf('/', end - 1) + 1, end)
    val dot = chunk.lastIndexOf('.')
    if (dot < 0) return null
    val ft = chunk.substring(dot + 1)
    if (ft.length <= 5 || AllowedTypes.contains(ft.toLowerCase)) ft.toLowerCase
    else null
  }

  private def splitNonEmpty(path: String): Array[String] = {
    val raw = path.split('/')
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    if (n == raw.length) raw
    else {
      val out = new Array[String](n)
      var j = 0; i = 0
      while (i < raw.length) { if (raw(i).nonEmpty) { out(j) = raw(i); j += 1 }; i += 1 }
      out
    }
  }

  /** newsurl.py:26-101 */
  def isNewsUrl(url: String): Boolean = {
    if (url == null) return false
    var path = PyUrl.urlparse(url).path
    if (!path.startsWith("/")) return false
    if (path.endsWith("/")) path = path.substring(0, path.length - 1)

    var pathTokens = splitNonEmpty(path)

    if (pathTokens.nonEmpty) {
      val fileType = urlToFiletype(url)
      if (fileType != null && !AllowedTypes.contains(fileType)) return false
      val lastToken = dotSplit.split(pathTokens(pathTokens.length - 1), -1)
      if (lastToken.length > 1)
        pathTokens(pathTokens.length - 1) = lastToken(lastToken.length - 2)
    }

    val idxIndex = pathTokens.indexOf("index")
    if (idxIndex >= 0) {
      val out = new Array[String](pathTokens.length - 1)
      System.arraycopy(pathTokens, 0, out, 0, idxIndex)
      System.arraycopy(pathTokens, idxIndex + 1, out, idxIndex,
        pathTokens.length - idxIndex - 1)
      pathTokens = out
    }

    val tldDat = PyUrl.tldExtract(url)
    val subd = tldDat.subdomain
    val tld = tldDat.domain.toLowerCase

    val urlSlug = if (pathTokens.nonEmpty) pathTokens(pathTokens.length - 1) else ""

    if (BadDomains.contains(tld)) return false

    val (dashCount, underscoreCount) =
      if (pathTokens.isEmpty) (0, 0)
      else (urlSlug.count(_ == '-'), urlSlug.count(_ == '_'))

    if (urlSlug.nonEmpty && (dashCount > 4 || underscoreCount > 4)) {
      if (dashCount >= underscoreCount && !slugHasTld(urlSlug, '-', tld)) return true
      if (underscoreCount > dashCount && !slugHasTld(urlSlug, '_', tld)) return true
    }

    if (pathTokens.length <= 1) return false

    var bi = 0
    while (bi < badChunksArr.length) {
      val b = badChunksArr(bi)
      if (b == subd) return false
      var ti = 0
      while (ti < pathTokens.length) {
        if (b == pathTokens(ti)) return false
        ti += 1
      }
      bi += 1
    }

    if (dateMatcher.get().reset(url).find()) return true

    var ti = 0
    while (ti < pathTokens.length) {
      if (goodPathsLower.contains(pathTokens(ti).toLowerCase)) return true
      ti += 1
    }

    false
  }

  /** `slug.split(sep, -1).map(_.toLowerCase).contains(tld)` without the
    * intermediate arrays.
    */
  private def slugHasTld(slug: String, sep: Char, tld: String): Boolean = {
    var start = 0
    while (start <= slug.length) {
      var end = slug.indexOf(sep, start)
      if (end < 0) end = slug.length
      if (end - start == tld.length && slug.regionMatches(true, start, tld, 0, tld.length))
        return true
      start = end + 1
    }
    false
  }
}
