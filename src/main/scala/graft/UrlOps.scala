package graft

import java.util.regex.Pattern

/** URL algebra of the reference crawler, ported 1:1 from
  * /root/reference/utils.py (clean_url:119-149, are_equals_urls:205-219,
  * is_valid_url:73-77, is_valid_url_to_navigate:80-116,
  * is_domain_link:156-181, get_filetype_from_url:184-196,
  * get_principal_domain:38-50, split_url_and_scheme:334-340).
  *
  * Pure, deterministic, null-safe — registered as Spark UDFs in
  * [[GraftFunctions]] and unit-tested against fixture truth tables.
  */
object UrlOps {

  /** utils.py:18 */
  val AllowedTypesToNavigate: Set[String] = Set(
    "html", "htm", "md", "rst", "aspx", "jsp", "rhtml", "cgi",
    "xhtml", "jhtml", "asp", "php", "shtml", "xml")

  /** utils.py:20-22 */
  val BadTokens: Seq[String] = Seq(
    "careers", "contact", "about", "faq", "terms", "privacy", "forum",
    "advert", "preferences", "feedback", "info", "browse", "howto", "search",
    "account", "subscribe", "donate", "shop", "admin", "cookies",
    "disclaimer", "coupon", "clickenc", "clickhere", "css", "meteo")

  private val badTokensArr: Array[String] = BadTokens.toArray

  private val wwwPrefix = Pattern.compile("^(www\\d?.)")
  private val schemePrefix = Pattern.compile("^https?://")
  private val equalsPrefix = Pattern.compile("^(https?://(www.)?)")
  private val mailtoPrefix = Pattern.compile("^https?://mailto")
  private val shareQuery = Pattern.compile("^(share=|e?mail=)")

  /** utils.py:38-45 — hostname minus leading `www\d?.` (note: the dot in
    * the reference regex is an unescaped wildcard; kept as-is).
    */
  def getPrincipalDomain(url: String): String = {
    if (url == null) return null
    val h = PyUrl.hostname(url)
    if (h == null) null else wwwPrefix.matcher(h).replaceFirst("")
  }

  /** utils.py:53-56 — netloc (host[:port]) as urlparse returns it. */
  def getDomain(url: String): String =
    if (url == null) null else PyUrl.urlparse(url).netloc

  /** utils.py:59-62 */
  def getScheme(url: String): String =
    if (url == null) null else PyUrl.urlparse(url).scheme

  /** utils.py:119-149 — the canonicalizer (P1). Percent-decodes, strips
    * `?query` (with the domain-aware exception that promotes an embedded
    * same-domain URL found in the query args), optionally prepends a
    * scheme, removes spaces, strips one trailing '/'.
    */
  def cleanUrl(url: String, removeArguments: Boolean = true,
               domain: String = null, scheme: String = null): String = {
    if (url == null) return null
    var result = PyUrl.unquote(url)
    if (domain != null || removeArguments) {
      val i = result.indexOf('?')
      if (i >= 0) {
        if (domain != null) {
          val result1 = result.substring(0, i)
          val result2 = result.substring(i + 1)
          if (result1.contains(domain) && removeArguments) {
            result = result1
          } else if (result2.contains(domain)) {
            val resSplit = result2.split("=", -1)
            var k = 0
            var done = false
            while (k < resSplit.length && !done) {
              val r = resSplit(k)
              if (r.contains(domain)) {
                result = r
                val amp = result.indexOf('&')
                if (amp >= 0) result = result.substring(0, amp)
                done = true
              }
              k += 1
            }
          }
        } else {
          result = result.substring(0, i)
        }
      }
    }
    if (scheme != null && !schemePrefix.matcher(result).lookingAt())
      result = scheme + "://" + result
    result = result.replace(" ", "")
    if (result.endsWith("/")) result = result.substring(0, result.length - 1)
    result
  }

  /** utils.py:334-340 — (scheme+"://", url without it). Scheme may be null. */
  def splitUrlAndScheme(url: String): (String, String) = {
    var cleaned = cleanUrl(url, removeArguments = false)
    val s = getScheme(cleaned)
    if (s != null && s.nonEmpty) {
      val pref = s + "://"
      val idx = cleaned.indexOf(pref)
      if (idx >= 0) cleaned = cleaned.substring(0, idx) + cleaned.substring(idx + pref.length)
      (pref, cleaned)
    } else (null, cleaned)
  }

  /** Canonical frontier key: scheme-stripped cleaned url. */
  def canonicalKey(url: String): String = splitUrlAndScheme(url)._2

  /** utils.py:205-219 */
  def areEqualsUrls(url1: String, url2: String): Boolean = {
    if (url1 == null || url2 == null) return false
    def norm(u: String): String = {
      var x = equalsPrefix.matcher(PyUrl.unquote(u)).replaceFirst("")
      x = x.replace(" ", "")
      if (x.endsWith("/")) x.substring(0, x.length - 1) else x
    }
    norm(url1) == norm(url2)
  }

  /** utils.py:73-77 — `validators.url(url, public=True)` equivalence for the
    * URL shapes a crawl sees: requires a scheme in the validators allow-set,
    * a public host (dotted domain with an alphabetic TLD, or a public IPv4),
    * and no whitespace.
    */
  private val validUrlPattern = Pattern.compile(
    "^(?i)(https?|ftp)://" +                    // scheme
    "(\\S+(:\\S*)?@)?" +                        // optional userinfo
    "(" +
      "(\\d{1,3}\\.){3}\\d{1,3}" +              // IPv4 (publicness checked below)
      "|" +
      "([a-zA-Z0-9\\u00a1-\\uffff](-?[a-zA-Z0-9\\u00a1-\\uffff])*)" + // host label
      "(\\.[a-zA-Z0-9\\u00a1-\\uffff](-?[a-zA-Z0-9\\u00a1-\\uffff])*)*" +
      "\\.[a-zA-Z\\u00a1-\\uffff]{2,}" +        // TLD — forces dotted public host
    ")" +
    "(:\\d{2,5})?" +                            // port
    "(/[^\\s]*)?" +                             // path/query/fragment
    "$")

  // hoisted: String.matches compiles a Pattern PER CALL, and this runs
  // once per discovered link (the engine's highest-volume scalar)
  private val ipv4Pattern = Pattern.compile("(\\d{1,3}\\.){3}\\d{1,3}")

  // Matcher reuse: Pattern.matcher allocates a Matcher + group arrays
  // per call, and this is a per-link predicate (Matcher is not
  // thread-safe — one per executor thread)
  private val validUrlMatcher = new ThreadLocal[java.util.regex.Matcher] {
    override def initialValue() = validUrlPattern.matcher("")
  }

  def isValidUrl(url: String): Boolean = {
    if (url == null || url.isEmpty) return false
    if (!validUrlMatcher.get().reset(url).matches()) return false
    val h = PyUrl.hostname(url)
    if (h == null) return false
    // public=True: reject private/reserved IPv4
    if (ipv4Pattern.matcher(h).matches()) {
      val parts = h.split('.').map(_.toInt)
      if (parts.exists(_ > 255)) return false
      val a = parts(0); val b = parts(1)
      val priv = a == 10 || a == 127 || a == 0 ||
        (a == 172 && b >= 16 && b <= 31) || (a == 192 && b == 168) ||
        (a == 169 && b == 254)
      if (priv) return false
    }
    true
  }

  /** utils.py:184-196 — last path chunk's extension if ≤5 chars. */
  def getFiletypeFromUrl(url: String): String = {
    if (url == null) return null
    var path = PyUrl.urlparse(url).path
    if (path.endsWith("/")) path = path.substring(0, path.length - 1)
    // last non-empty '/'-chunk, then the suffix after its last '.' —
    // index math instead of split("\\.") (String.split on "." compiles
    // a regex per call) and with no intermediate arrays
    var end = path.length
    while (end > 0 && path.charAt(end - 1) == '/') end -= 1
    if (end > 0) {
      var start = path.lastIndexOf('/', end - 1) + 1
      val chunk = path.substring(start, end)
      val dot = chunk.lastIndexOf('.')
      if (dot < 0) return null // "no second split part" in the reference
      val ft = chunk.substring(dot + 1)
      if (ft.length <= 5) return ft.toLowerCase
    }
    null
  }

  /** utils.py:80-116 — the navigability gate (P5). */
  def isValidUrlToNavigate(url: String): Boolean = {
    if (url == null) return false
    val tld = PyUrl.tldExtract(url)
    var subDomain = tld.subdomain
    var result = isValidUrl(url)
    var fileType: String = null
    if (mailtoPrefix.matcher(url).lookingAt()) result = false
    if (result) {
      val parsed = PyUrl.urlparse(url)
      val query = parsed.query
      if (result && query.nonEmpty) {
        if (shareQuery.matcher(query.toLowerCase).lookingAt()) result = false
      }
      if (result) {
        fileType = getFiletypeFromUrl(url)
        result = fileType == null || AllowedTypesToNavigate.contains(fileType)
      }
      if (result) {
        var path = parsed.path.toLowerCase
        if (path.endsWith("/")) path = path.substring(0, path.length - 1)
        // plain arrays + index loops: Scala 2.13's ArrayBuffer allocates
        // a checked view + iterator per `contains`, and this ran
        // |BadTokens| times per discovered link (measured ~19 GB/wave)
        val tokens = path.split("/", -1)
        if (fileType != null && tokens.nonEmpty)
          tokens(tokens.length - 1) =
            tokens(tokens.length - 1).replace("." + fileType, "")
        if (subDomain != null) subDomain = subDomain.toLowerCase
        val bts = badTokensArr
        var bi = 0
        var break = false
        while (bi < bts.length && !break) {
          val b = bts(bi)
          var ti = 0
          while (ti < tokens.length && !break) {
            if (b == tokens(ti)) break = true
            ti += 1
          }
          if (!break && subDomain != null && subDomain.nonEmpty && b == subDomain)
            break = true
          bi += 1
        }
        if (break) result = false
      }
    }
    result
  }

  /** utils.py:156-181 — substring-position heuristic keeping links
    * intra-domain (P6): domain must occur before any of `? ; { =`.
    */
  def isDomainLink(url: String, domain: String): Boolean = {
    if (url == null || domain == null) return false
    if (!url.contains(domain)) return false
    val i2 = url.indexOf(domain) + domain.length
    val q = url.indexOf('?')
    if (q >= 0) return i2 < q
    val semi = url.indexOf(';')
    if (semi >= 0) return i2 < semi
    val brace = url.indexOf('{')
    if (brace >= 0) return i2 < brace
    val eq = url.indexOf('=')
    if (eq >= 0) return i2 < eq
    true
  }
}
