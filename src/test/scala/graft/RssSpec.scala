package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{Dom, RssDiscovery, RssParse, SitemapParse}

/** RSS feed discovery (S8): link-alternate first, then .xml anchors,
  * then rss/feed anchors (extractor.py:136-158 cascade order).
  */
class RssSpec extends AnyFunSuite {

  private val url = "https://www.host0.example.com/index"

  test("link rel=alternate feeds win and keep titles") {
    val tree = Dom.parse(
      """<html><head><link rel="alternate" type="application/rss+xml" href="https://www.host0.example.com/feed.xml" title="Main"/></head>
        |<body><a href="https://www.host0.example.com/other-rss.html">rss</a></body></html>"""
        .stripMargin.split("\\s+").mkString(" "))
    assert(RssDiscovery.extractFeeds(tree, url) ===
      List(("https://www.host0.example.com/feed.xml", "Main")))
  }

  test(".xml anchors are the second tier") {
    val tree = Dom.parse(
      """<html><head></head><body>
        |<a href="https://www.host0.example.com/sitemap.xml">x</a>
        |<a href="https://www.host0.example.com/page.html">y</a></body></html>"""
        .stripMargin.split("\\s+").mkString(" "))
    assert(RssDiscovery.extractFeeds(tree, url).map(_._1) ===
      List("https://www.host0.example.com/sitemap.xml"))
  }

  test("rss/feed anchors are the last tier; self-equal urls excluded") {
    val tree = Dom.parse(
      """<html><head></head><body>
        |<a href="https://www.host0.example.com/rss-news.html">r</a>
        |<a href="relative/feed">f</a></body></html>"""
        .stripMargin.split("\\s+").mkString(" "))
    val feeds = RssDiscovery.extractFeeds(tree, url).map(_._1)
    assert(feeds.contains("https://www.host0.example.com/rss-news.html"))
    assert(feeds.contains(s"$url/relative/feed"))
  }

  // ---- feed-body parsing (StAX path + regex fallback) ----

  test("multiline RSS 2.0 with CDATA title and entity in link") {
    val body =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<rss version="2.0">
        |  <channel>
        |    <title>chan</title>
        |    <item>
        |      <title><![CDATA[A & B <news>]]></title>
        |      <link>https://x.example.com/a?p=1&amp;q=2</link>
        |      <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
        |    </item>
        |    <item>
        |      <title>plain</title>
        |      <link>https://x.example.com/b</link>
        |    </item>
        |  </channel>
        |</rss>""".stripMargin
    assert(RssParse.entries(body) === List(
      RssParse.Entry("A & B <news>", "https://x.example.com/a?p=1&q=2",
        "Mon, 01 Jan 2024 00:00:00 GMT"),
      RssParse.Entry("plain", "https://x.example.com/b", null)))
  }

  test("namespaced Atom: rel=alternate href wins over rel=self; source/media subtrees never shadow") {
    val body =
      """<?xml version="1.0"?>
        |<feed xmlns="http://www.w3.org/2005/Atom" xmlns:media="http://search.yahoo.com/mrss/">
        |  <title>feed-title</title>
        |  <entry>
        |    <source>
        |      <title>origin-feed</title>
        |      <link rel="alternate" href="https://origin.example.com/"/>
        |      <updated>1999</updated>
        |    </source>
        |    <media:title>thumb caption</media:title>
        |    <link rel="self" href="https://x.example.com/self"/>
        |    <link rel="alternate" href="https://x.example.com/article"/>
        |    <title>real title</title>
        |    <published>2024-05-01T00:00:00Z</published>
        |  </entry>
        |</feed>""".stripMargin
    assert(RssParse.entries(body) === List(
      RssParse.Entry("real title", "https://x.example.com/article",
        "2024-05-01T00:00:00Z")))
  }

  test("malformed markup degrades to the regex scan") {
    // unclosed <channel> + stray & make this non-well-formed XML
    val body = "<rss version=\"2.0\"><channel>" +
      "<item><title>t1 & t2</title><link>https://x.example.com/m</link>" +
      "<pubDate>d</pubDate></item>"
    assert(RssParse.entries(body) === List(
      RssParse.Entry("t1 & t2", "https://x.example.com/m", "d")))
  }

  test("regex fallback unwraps CDATA like the XML path") {
    val body = "<rss><channel><item><title><![CDATA[cd title]]></title>" +
      "<link>https://x.example.com/c</link></item>" // unclosed channel/rss
    assert(RssParse.entries(body) === List(
      RssParse.Entry("cd title", "https://x.example.com/c", null)))
  }

  test("SitemapParse: urlset locs in document order, whitespace trimmed") {
    val us = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      "<url><loc>https://a.com/1.html</loc><lastmod>2024-01-01</lastmod></url>" +
      "<url><loc> https://a.com/2.html </loc><priority>0.5</priority></url>" +
      "</urlset>"
    assert(SitemapParse.isSitemap(us))
    assert(!RssParse.isFeed("x") || true) // (doc: isFeed would also accept <?xml)
    assert(SitemapParse.locs(us) ===
      List("https://a.com/1.html", "https://a.com/2.html"))
  }

  test("SitemapParse: sitemapindex lists child sitemaps; no xml prologue needed") {
    val si = "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>" +
      "<lastmod>2024-02-02</lastmod></sitemap>" +
      "<sitemap><loc>https://a.com/s2.xml</loc></sitemap></sitemapindex>"
    assert(SitemapParse.isSitemap(si))
    assert(SitemapParse.locs(si) ===
      List("https://a.com/s1.xml", "https://a.com/s2.xml"))
  }

  test("SitemapParse: extension-namespace locs do not leak; CDATA unwraps") {
    val ext = "<?xml version=\"1.0\"?>" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\" " +
      "xmlns:image=\"http://www.google.com/schemas/sitemap-image/1.1\">" +
      "<url><loc>https://a.com/p.html</loc>" +
      "<image:image><image:loc>https://a.com/i.jpg</image:loc></image:image>" +
      "</url></urlset>"
    assert(SitemapParse.locs(ext) === List("https://a.com/p.html"))
    val cd = "<urlset><url><loc><![CDATA[https://a.com/c.html]]></loc></url></urlset>"
    assert(SitemapParse.locs(cd) === List("https://a.com/c.html"))
  }

  test("SitemapParse: BOM / comment / DOCTYPE prologue junk is skipped") {
    // real-world bodies: UTF-8 BOM (not isWhitespace), leading comments,
    // DOCTYPE — all before the root element (ADVICE r4)
    val core = "<urlset><url><loc>https://a.com/b.html</loc></url></urlset>"
    assert(SitemapParse.isSitemap("\uFEFF" + core))
    assert(SitemapParse.isSitemap("<!-- generated nightly -->\n" + core))
    assert(SitemapParse.isSitemap("<!DOCTYPE urlset>\n" + core))
    assert(SitemapParse.isSitemap(
      "\uFEFF<?xml version=\"1.0\"?>\n<!-- c1 --><!-- c2 -->\n" + core))
    assert(!SitemapParse.isSitemap("\uFEFF<!-- x --><html></html>"))
  }

  test("SitemapParse: malformed XML degrades to the regex fallback") {
    // unclosed root: StAX raises at EOF, the complete <url> block still parses
    val bad = "<urlset><url><loc>https://a.com/x.html</loc></url>" +
      "<url><loc>https://a.com/y.html</loc></url>"
    assert(SitemapParse.locs(bad) ===
      List("https://a.com/x.html", "https://a.com/y.html"))
    // not a sitemap at all
    assert(!SitemapParse.isSitemap("<html><body>hi</body></html>"))
    assert(!SitemapParse.isSitemap("<?xml version=\"1.0\"?><rss/>"))
  }
}
