package graft
package extract

import java.util.regex.Pattern

/** S8 — RSS 2.0 / Atom feed-body parsing (the table-world counterpart of
  * the reference's `feedparser.parse(feed.url)` ingestion,
  * /root/reference/crawling_tools/crawler.py:435-463): entries become
  * frontier rows with scraped=0 semantics, carrying the pre-known
  * title/date metadata the reference stashes in its WorkInfo.
  *
  * Deterministic pattern-based extraction sized to the synthetic feeds
  * (WebGen emits well-formed single-line XML); a full XML parser is the
  * drop-in replacement when arbitrary real-world feeds are in scope —
  * the call sites and the Entry schema stay.
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

  private val ItemP = Pattern.compile("(?s)<(item|entry)\\b.*?</\\1>")
  private val TitleP = Pattern.compile("(?s)<title[^>]*>(.*?)</title>")
  private val LinkP = Pattern.compile("(?s)<link[^>]*>(.*?)</link>")
  private val LinkHrefP = Pattern.compile("<link[^>]*href=\"([^\"]*)\"")
  private val DateP = Pattern.compile(
    "(?s)<(pubDate|updated|published)[^>]*>(.*?)</\\1>")

  private def first(p: Pattern, s: String, g: Int): String = {
    val m = p.matcher(s)
    if (m.find()) m.group(g).trim else null
  }

  /** All entries of a feed body, document order. Entries without a link
    * are dropped (the reference's `_parse_rss_entry` cleans and inserts
    * by link, crawler.py:459-462).
    */
  def entries(body: String): List[Entry] = {
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
