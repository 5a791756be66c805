package graft

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

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

  /** newsurl.py:103-122 — like UrlOps.getFiletypeFromUrl but also accepts
    * long extensions that are in AllowedTypes, and returns null when the
    * path has no chunks (reference raises IndexError there; callers only
    * reach it with ≥1 chunk).
    */
  def urlToFiletype(absUrl: String): String = {
    var path = PyUrl.urlparse(absUrl).path
    if (path.endsWith("/")) path = path.substring(0, path.length - 1)
    val chunks = path.split('/').filter(_.nonEmpty)
    if (chunks.isEmpty) return null
    val lastChunk = chunks.last.split("\\.", -1)
    if (lastChunk.length < 2) return null
    val ft = lastChunk.last
    if (ft.length <= 5 || AllowedTypes.contains(ft.toLowerCase)) ft.toLowerCase
    else null
  }

  /** newsurl.py:26-101 */
  def isNewsUrl(url: String): Boolean = {
    if (url == null) return false
    var path = PyUrl.urlparse(url).path
    if (!path.startsWith("/")) return false
    if (path.endsWith("/")) path = path.substring(0, path.length - 1)

    val pathTokens = ArrayBuffer.from(path.split('/').filter(_.nonEmpty))

    if (pathTokens.nonEmpty) {
      val fileType = urlToFiletype(url)
      if (fileType != null && !AllowedTypes.contains(fileType)) return false
      val lastToken = pathTokens.last.split("\\.", -1)
      if (lastToken.length > 1)
        pathTokens(pathTokens.length - 1) = lastToken(lastToken.length - 2)
    }

    val idxIndex = pathTokens.indexOf("index")
    if (idxIndex >= 0) pathTokens.remove(idxIndex)

    val tldDat = PyUrl.tldExtract(url)
    val subd = tldDat.subdomain
    val tld = tldDat.domain.toLowerCase

    val urlSlug = if (pathTokens.nonEmpty) pathTokens.last else ""

    if (BadDomains.contains(tld)) return false

    val (dashCount, underscoreCount) =
      if (pathTokens.isEmpty) (0, 0)
      else (urlSlug.count(_ == '-'), urlSlug.count(_ == '_'))

    if (urlSlug.nonEmpty && (dashCount > 4 || underscoreCount > 4)) {
      if (dashCount >= underscoreCount &&
          !urlSlug.split("-", -1).map(_.toLowerCase).contains(tld)) return true
      if (underscoreCount > dashCount &&
          !urlSlug.split("_", -1).map(_.toLowerCase).contains(tld)) return true
    }

    if (pathTokens.length <= 1) return false

    for (b <- BadChunks)
      if (pathTokens.contains(b) || b == subd) return false

    if (DateRegex.matcher(url).find()) return true

    val lowered = pathTokens.map(_.toLowerCase)
    for (good <- GoodPaths)
      if (lowered.contains(good.toLowerCase)) return true

    false
  }
}
