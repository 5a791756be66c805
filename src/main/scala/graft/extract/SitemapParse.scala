package graft
package extract

import java.io.StringReader
import java.util.regex.Pattern

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Sitemap-protocol body parsing (sitemaps.org, the public spec robots.txt
  * `Sitemap:` lines point at) — a NEW-engine capability like robots
  * handling itself: the reference never reads sitemaps, but they are the
  * second thing a real crawl operator wires up after robots.txt. Both
  * document kinds yield frontier candidates: a `<urlset>` lists page URLs
  * (`<url><loc>`), a `<sitemapindex>` lists CHILD sitemap URLs
  * (`<sitemap><loc>`) which are themselves fetchable frontier rows — the
  * two-level cascade resolves through ordinary crawling, no recursion in
  * the parser.
  *
  * Parsing mirrors [[RssParse]]: a real streaming XML walk (JDK StAX,
  * coalescing, DTD/external entities off) with a deterministic regex
  * fallback for malformed bodies.
  */
object SitemapParse {

  /** True when a fetched body is a sitemap document. Checked BEFORE
    * [[RssParse.isFeed]] in PageParse: `isFeed` accepts any `<?xml`
    * prologue, which would swallow sitemap bodies.
    */
  def isSitemap(body: String): Boolean = {
    // real-world prologue junk before the root element: UTF-8 BOM
    // (U+FEFF is NOT isWhitespace), <?xml?> declaration, comments,
    // DOCTYPE — all skipped before the root-element check (ADVICE r4)
    var t = body.dropWhile(c => c.isWhitespace || c == '\uFEFF')
    var more = true
    while (more) {
      more = false
      if (t.startsWith("<?xml")) {
        val e = t.indexOf("?>")
        t = if (e < 0) "" else t.substring(e + 2)
        more = true
      } else if (t.startsWith("<!--")) {
        val e = t.indexOf("-->")
        t = if (e < 0) "" else t.substring(e + 3)
        more = true
      } else if (t.startsWith("<!DOCTYPE")) {
        val e = t.indexOf('>')
        t = if (e < 0) "" else t.substring(e + 1)
        more = true
      }
      if (more) t = t.dropWhile(c => c.isWhitespace || c == '\uFEFF')
    }
    t.startsWith("<urlset") || t.startsWith("<sitemapindex")
  }

  /** All `<loc>` values (page URLs of a urlset, child sitemap URLs of a
    * sitemapindex), document order, duplicates preserved (the caller
    * dedups through the frontier like any link list).
    */
  def locs(body: String): List[String] =
    try locsXml(body)
    catch { case scala.util.control.NonFatal(_) => locsRegex(body) }

  private val factory = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      f
    }
  }

  private val SitemapNs = "http://www.sitemaps.org/schemas/sitemap/0.9"

  /** `<loc>` is read only as the DIRECT child of a `<url>` / `<sitemap>`
    * entry at depth 2, in the core (none / sitemaps.org) namespace —
    * extension subtrees and elements (image:loc, video:, xhtml:) carry
    * their own loc-like names and must not leak in.
    */
  private def locsXml(body: String): List[String] = {
    val r = factory.get().createXMLStreamReader(new StringReader(body))
    try {
      val out = List.newBuilder[String]
      var depth = 0
      var entryDepth = -1
      var capture = false
      val sb = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            depth += 1
            val ln = r.getLocalName
            val ns = r.getNamespaceURI
            val core = ns == null || ns.isEmpty || ns == SitemapNs
            if (depth == 2 && core && (ln == "url" || ln == "sitemap")) {
              entryDepth = depth
            } else if (entryDepth > 0 && depth == entryDepth + 1 &&
                core && ln == "loc") {
              capture = true; sb.clear()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA |
              XMLStreamConstants.ENTITY_REFERENCE =>
            if (capture) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (capture && depth == entryDepth + 1) {
              val v = sb.toString.trim
              if (v.nonEmpty) out += v
              capture = false
            }
            if (entryDepth == depth) entryDepth = -1
            depth -= 1
          case _ =>
        }
      }
      out.result()
    } finally r.close()
  }

  private val EntryP = Pattern.compile("(?s)<(url|sitemap)\\b.*?</\\1>")
  private val LocP = Pattern.compile("(?s)<loc[^>]*>(.*?)</loc>")
  private val CdataP = Pattern.compile("(?s)<!\\[CDATA\\[(.*?)\\]\\]>")

  private def locsRegex(body: String): List[String] = {
    val out = List.newBuilder[String]
    val m = EntryP.matcher(body)
    while (m.find()) {
      val lm = LocP.matcher(m.group(0))
      if (lm.find()) {
        var v = lm.group(1).trim
        val cm = CdataP.matcher(v)
        if (cm.matches()) v = cm.group(1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result()
  }
}
