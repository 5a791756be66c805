package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AdRules, Resources}

/** Third-party-resource pipeline (S5/J3/J4/J6): harvest filters mirror
  * get_har (custom_webbrowser.py:171-196); rule matching mirrors
  * adblockparser's translation used by ads_extractor.py.
  */
class HarSpec extends AnyFunSuite {

  private val pageUrl = "https://www.host0.example.com/news/2024/03/5/story-1.html"

  test("harvest: cross-domain resources kept; same-domain/social/jpg dropped") {
    val html =
      """<html><head>
        |<link rel="stylesheet" href="https://cdn.example.net/style.css"/>
        |</head><body>
        |<script src="https://tracker.example.org/t.js"></script>
        |<script src="https://www.host0.example.com/own.js"></script>
        |<img src="https://images.example.net/pic.jpg"/>
        |<img src="https://images.example.net/pic.webp"/>
        |<iframe src="https://www.youtube.com/embed/x"></iframe>
        |<script src="https://tracker.example.org/t.js"></script>
        |</body></html>""".stripMargin
    val got = Resources.harvestResources(html, pageUrl)
    assert(got.contains("https://cdn.example.net/style.css"))
    assert(got.contains("https://tracker.example.org/t.js"))
    assert(got.contains("https://images.example.net/pic.webp"))
    // same-domain dropped (remove_domain_request=True)
    assert(!got.exists(_.contains("own.js")))
    // jpg filetype dropped; youtube.com social domain dropped
    assert(!got.exists(_.contains("pic.jpg")))
    assert(!got.exists(_.contains("youtube")))
    // set-dedup
    assert(got.count(_ == "https://tracker.example.org/t.js") === 1)
  }

  test("fused harvest: PageParse.parse yields the SAME resources from its single DOM parse") {
    val html =
      """<html><head>
        |<link rel="stylesheet" href="https://cdn.example.net/style.css"/>
        |</head><body>
        |<p>Some article text to push the page over the 200-char extraction
        |gate; the resource walk runs before href rewriting and cleanup.</p>
        |<script src="https://tracker.example.org/t.js"></script>
        |<script src="https://www.host0.example.com/own.js"></script>
        |<img src="https://images.example.net/pic.webp"/>
        |<iframe src="https://www.youtube.com/embed/x"></iframe>
        |</body></html>""".stripMargin
    val viaParse = graft.crawl.PageParse
      .parse(html.getBytes("UTF-8"), pageUrl, isWebnews = false).resources
    val standalone = Resources.harvestResources(html, pageUrl)
    assert(viaParse === standalone)
    assert(viaParse === List(
      "https://cdn.example.net/style.css",
      "https://tracker.example.org/t.js",
      "https://images.example.net/pic.webp"))
  }

  test("adblock rules: ||host^, substring, *wildcard*, @@exception, comments") {
    val rules = AdRules(Seq(
      "! a comment",
      "||ads.example.com^",
      "/banner/",
      "*track*",
      "@@||ads.example.com/ok/",
      "##elemhide.ignored",
      "option$third-party"))
    assert(rules.isAd("https://ads.example.com/img/a.gif"))
    assert(rules.isAd("http://sub.ads.example.com/x"))
    assert(rules.isAd("https://cdn.example.net/banner/b.js"))
    assert(rules.isAd("https://x.org/t/track-7.js"))
    // exception overrides the host block
    assert(!rules.isAd("https://ads.example.com/ok/c.js"))
    // clean urls
    assert(!rules.isAd("https://static.example.org/app.css"))
    // ||host^ must not match the host as a substring of another host
    assert(!rules.isAd("https://notads.example.com.evil.org/x".replace(
      "notads.example.com.evil.org", "fine.org")))
    assert(rules.isAd("https://ads.example.com:8080/y") ===
      rules.isAd("https://ads.example.com/y")) // port after ^-separator
  }

  test("resource edges: page↔resource dedup and dim extraction") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    import spark.implicits._
    val html =
      ("""<html><head></head><body>""" +
        """<script src="https://cdn.example.net/lib.js"></script>""" +
        """<script src="https://cdn.example.net/lib.js"></script>""" +
        """</body></html>""").getBytes("UTF-8")
    val pages = Seq(
      ("https://www.a.com/p1", html),
      ("https://www.b.com/p2", html)).toDF("url", "html")
    val edges = Resources.resourceEdges(pages, "url", "html")
    assert(edges.count() === 2) // one edge per page (dedup within page)
    val dim = edges.select($"resKey", $"resUrl").distinct()
    assert(dim.count() === 1)
    val classified = Resources.classifyResources(
      dim, "resUrl", AdRules(Seq("||cdn.example.net^")))
    assert(classified.filter($"is_advertising").count() === 1)
  }
}
