package graft

import java.nio.charset.StandardCharsets

/** Minimal, allocation-light reimplementation of the Python stdlib URL
  * behaviors the reference relies on (`urllib.parse.unquote`,
  * `urllib.parse.urlparse`, and a `tldextract`-shaped suffix split).
  *
  * Reference semantics: /root/reference/utils.py:38-50,119-149,184-196
  * and /root/reference/newspaperlite/newsurl.py:26-122. This is a
  * clean-room port of the *behavior* (what those stdlib calls return for
  * the URL shapes the crawler sees), not of any implementation.
  *
  * All functions are pure and deterministic — safe inside Spark UDFs and
  * whole-row Dataset maps on executors.
  */
object PyUrl {

  /** Percent-decoding equivalent to Python `urllib.parse.unquote(s)`:
    * decodes %XX byte sequences as UTF-8 with replacement for invalid
    * sequences; lone/invalid '%' escapes pass through verbatim.
    */
  def unquote(s: String): String = {
    if (s == null || s.indexOf('%') < 0) return s
    val out = new StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream(8)
    var i = 0
    def flushBytes(): Unit = {
      if (bytes.size() > 0) {
        out.append(new String(bytes.toByteArray, StandardCharsets.UTF_8))
        bytes.reset()
      }
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { flushBytes(); out.append(c); i += 1 }
    }
    flushBytes()
    out.toString
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Result of `urlparse` — the five components the reference reads. */
  final case class Parsed(scheme: String, netloc: String, path: String,
                          query: String, fragment: String) {
    /** Python `ParseResult.hostname`: lowercased host, port stripped. */
    def hostname: String = {
      if (netloc.isEmpty) return null
      // strip userinfo
      val at = netloc.lastIndexOf('@')
      var h = if (at >= 0) netloc.substring(at + 1) else netloc
      // strip port (but not inside IPv6 brackets)
      if (h.startsWith("[")) {
        val end = h.indexOf(']')
        if (end >= 0) h = h.substring(1, end)
      } else {
        val colon = h.indexOf(':')
        if (colon >= 0) h = h.substring(0, colon)
      }
      if (h.isEmpty) null else h.toLowerCase
    }
  }

  /** Equivalent of Python `urllib.parse.urlparse` for the URL shapes the
    * crawler handles. Scheme is recognized only when followed by valid
    * RFC-3986 scheme chars; netloc only after "//".
    */
  // one-slot per-thread memo: every discovered link is examined by a
  // chain of predicates (clean → valid → navigable → news → filetype),
  // each of which re-parses the SAME url string — measured ~16 GB/wave
  // of parse allocations at the bench geometry, ~4× the single parse.
  // slot(0) = url key, slot(1) = Parsed value.
  private val lastParse = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](2)
  }

  def urlparse(url: String): Parsed = {
    if (url == null) return urlparse0(null)
    val slot = lastParse.get()
    val k = slot(0).asInstanceOf[String]
    if ((k eq url) || (k != null && k == url))
      return slot(1).asInstanceOf[Parsed]
    val p = urlparse0(url)
    slot(0) = url
    slot(1) = p
    p
  }

  private def urlparse0(url: String): Parsed = {
    var rest = if (url == null) "" else url
    var fragment = ""
    var query = ""
    var scheme = ""
    var netloc = ""
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = rest.substring(hash + 1); rest = rest.substring(0, hash) }
    // scheme: letter followed by letters/digits/+-. then ':'
    val colon = rest.indexOf(':')
    if (colon > 0) {
      val cand = rest.substring(0, colon)
      if (cand.charAt(0).isLetter && cand.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) {
        scheme = cand.toLowerCase
        rest = rest.substring(colon + 1)
      }
    }
    if (rest.startsWith("//")) {
      var end = rest.length
      var j = 2
      var found = false
      while (j < rest.length && !found) {
        val c = rest.charAt(j)
        if (c == '/' || c == '?' || c == '#') { end = j; found = true }
        j += 1
      }
      netloc = rest.substring(2, end)
      rest = rest.substring(end)
    }
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    Parsed(scheme, netloc, rest, query, fragment)
  }

  def hostname(url: String): String = urlparse(url).hostname

  // ---- tldextract-shaped suffix split -------------------------------------

  /** Two-label public suffixes common in news-crawl corpora. A full PSL is
    * unnecessary: the reference's tldextract calls only read `.subdomain`
    * and `.domain`, and the synthetic corpus controls its own hosts.
    */
  private val twoLabelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "gov.au", "edu.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "co.nz", "co.kr", "co.il", "co.id", "co.th",
    "gov.it", "edu.it")

  final case class TldParts(subdomain: String, domain: String, suffix: String)

  /** tldextract.extract(url) equivalent: splits the registered domain out
    * of the hostname. Accepts full URLs or bare hosts (tldextract does both).
    */
  private val lastTld = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](2)
  }

  def tldExtract(url: String): TldParts = {
    if (url == null) return tldExtract0(null)
    val slot = lastTld.get()
    val k = slot(0).asInstanceOf[String]
    if ((k eq url) || (k != null && k == url))
      return slot(1).asInstanceOf[TldParts]
    val p = tldExtract0(url)
    slot(0) = url
    slot(1) = p
    p
  }

  private def tldExtract0(url: String): TldParts = {
    var host = hostname(if (url != null && url.contains("//")) url else "http://" + (if (url == null) "" else url))
    if (host == null) host = ""
    val labels = host.split('.')
    if (labels.length <= 1) return TldParts("", host, "")
    val lastTwo = labels.takeRight(2).mkString(".")
    val suffixLen = if (labels.length >= 3 && twoLabelSuffixes.contains(lastTwo)) 2 else 1
    val suffix = labels.takeRight(suffixLen).mkString(".")
    val domain = labels(labels.length - suffixLen - 1)
    val sub = labels.dropRight(suffixLen + 1).mkString(".")
    TldParts(sub, domain, suffix)
  }
}
