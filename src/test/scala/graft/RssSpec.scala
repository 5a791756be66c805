package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{Dom, RssDiscovery}

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
}
