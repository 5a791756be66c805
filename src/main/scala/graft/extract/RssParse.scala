package graft
package extract

import java.io.StringReader
import java.util.regex.Pattern

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** S8 — RSS 2.0 / Atom feed-body parsing (the table-world counterpart of
  * the reference's `feedparser.parse(feed.url)` ingestion,
  * /root/reference/crawling_tools/crawler.py:435-463): entries become
  * frontier rows with scraped=0 semantics, carrying the pre-known
  * title/date metadata the reference stashes in its WorkInfo.
  *
  * Parsing is a real streaming XML walk (JDK StAX, coalescing so CDATA
  * and split text nodes read as one value, DTD/external entities off) —
  * it handles CDATA titles, multiline markup, and namespaced Atom the
  * way feedparser does. Feed bodies that are not well-formed XML (real
  * feeds often aren't; feedparser's sgmllib fallback recovers them)
  * degrade to a deterministic regex scan over item/entry blocks.
  */
object RssParse {

  /** True when a fetched body is a feed, not an HTML page (the reference
    * separates these by mime type text/xml vs text/html,
    * rss_finder.py:18-39).
    */
  def isFeed(body: String): Boolean = {
    val t = body.dropWhile(_.isWhitespace)
    t.startsWith("<?xml") || t.startsWith("<rss") || t.startsWith("<feed")
  }

  /** One feed entry (crawler.py:457-462 fields: title, link, published,
    * section).
    */
  case class Entry(title: String, link: String, published: String)

  /** All entries of a feed body, document order. Entries without a link
    * are dropped (the reference's `_parse_rss_entry` cleans and inserts
    * by link, crawler.py:459-462).
    */
  def entries(body: String): List[Entry] =
    try entriesXml(body)
    catch { case scala.util.control.NonFatal(_) => entriesRegex(body) }

  // ---------------------------------------------------------------- StAX

  private val AtomNs = "http://www.w3.org/2005/Atom"
  private val Rss1Ns = "http://purl.org/rss/1.0/"

  /** XMLInputFactory is not specified thread-safe; one per Spark task
    * thread.
    */
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

  /** Entry fields are taken only from DIRECT children of item/entry in
    * the core namespaces (none / Atom / RSS 1.0) — so `media:title`,
    * Atom `<source>` metadata, and other extension subtrees can never
    * shadow the entry's own title/link/date (feedparser keys extension
    * elements separately for the same reason).
    */
  private def entriesXml(body: String): List[Entry] = {
    val r = factory.get().createXMLStreamReader(new StringReader(body))
    try {
      val out = List.newBuilder[Entry]
      var depth = 0
      var entryDepth = -1 // depth of the open item/entry; -1 outside
      var skipDepth = -1  // depth of an extension subtree being ignored
      var title: String = null; var linkText: String = null
      var hrefAlt: String = null; var hrefAny: String = null
      var date: String = null
      var capture: Int = 0 // 1=title 2=link 3=date
      val sb = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            depth += 1
            val ns = r.getNamespaceURI
            val core = ns == null || ns.isEmpty || ns == AtomNs || ns == Rss1Ns
            if (entryDepth < 0) {
              val ln = r.getLocalName
              if (core && (ln == "item" || ln == "entry")) {
                entryDepth = depth
                title = null; linkText = null; hrefAlt = null
                hrefAny = null; date = null
              }
            } else if (skipDepth < 0 && depth == entryDepth + 1) {
              if (core) r.getLocalName match {
                case "title" if title == null =>
                  capture = 1; sb.clear()
                case "link" =>
                  val h = r.getAttributeValue(null, "href")
                  if (h != null) { // Atom link: alternate (or bare) wins
                    val rel = r.getAttributeValue(null, "rel")
                    if ((rel == null || rel == "alternate") && hrefAlt == null)
                      hrefAlt = h
                    if (hrefAny == null) hrefAny = h
                  }
                  if (linkText == null) { capture = 2; sb.clear() }
                case "pubDate" | "updated" | "published" if date == null =>
                  capture = 3; sb.clear()
                case "source" => skipDepth = depth // Atom entry provenance
                case _ =>
              } else skipDepth = depth // extension subtree (media:, dc:, …)
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA |
              XMLStreamConstants.ENTITY_REFERENCE =>
            if (capture != 0) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (capture != 0 && depth == entryDepth + 1) {
              val v = sb.toString.trim
              capture match {
                case 1 => title = v
                case 2 => if (v.nonEmpty && linkText == null) linkText = v
                case _ => date = v
              }
              capture = 0
            }
            if (skipDepth == depth) skipDepth = -1
            if (entryDepth == depth) {
              val link =
                if (linkText != null) linkText
                else if (hrefAlt != null) hrefAlt
                else hrefAny
              if (link != null && link.nonEmpty)
                out += Entry(title, link, date)
              entryDepth = -1
            }
            depth -= 1
          case _ =>
        }
      }
      out.result()
    } finally r.close()
  }

  // ------------------------------------------- regex fallback (malformed)

  private val ItemP = Pattern.compile("(?s)<(item|entry)\\b.*?</\\1>")
  private val TitleP = Pattern.compile("(?s)<title[^>]*>(.*?)</title>")
  private val LinkP = Pattern.compile("(?s)<link[^>]*>(.*?)</link>")
  private val LinkHrefP = Pattern.compile("<link[^>]*href=\"([^\"]*)\"")
  private val DateP = Pattern.compile(
    "(?s)<(pubDate|updated|published)[^>]*>(.*?)</\\1>")
  private val CdataP = Pattern.compile("(?s)<!\\[CDATA\\[(.*?)\\]\\]>")

  private def first(p: Pattern, s: String, g: Int): String = {
    val m = p.matcher(s)
    if (m.find()) unwrapCdata(m.group(g).trim) else null
  }

  private def unwrapCdata(s: String): String = {
    val m = CdataP.matcher(s)
    if (m.matches()) m.group(1).trim else s
  }

  private def entriesRegex(body: String): List[Entry] = {
    val out = List.newBuilder[Entry]
    val m = ItemP.matcher(body)
    while (m.find()) {
      val block = m.group(0)
      val link = {
        val l = first(LinkP, block, 1)
        if (l != null && l.nonEmpty) l else first(LinkHrefP, block, 1)
      }
      if (link != null && link.nonEmpty)
        out += Entry(first(TitleP, block, 1), link, first(DateP, block, 2))
    }
    out.result()
  }
}
