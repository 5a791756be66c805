package graft
package synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic web generator (FIXTURES.md §1): emits the input
  * table of BASELINE.json `input_hint` shape —
  * (url string, warc_ts timestamp, html binary, text string, lang string) —
  * as a pure function of the row index (no RNG state, no Date.now), so any
  * scale regenerates identically and generation parallelizes embarrassingly
  * via spark.range.
  *
  * Graph shape:
  *  - `nHosts` hosts; host 0 is a MEGA-HOST holding ~50% of all pages
  *    (skew-mitigation test bed, SURVEY.md §7.4).
  *  - per host: page 0 = /index.html hub (the seed), article/hub/private
  *    templates cycling by page-number mod 5; links stay intra-host (plus
  *    deliberate cross-host + non-navigable + tracking-query + dangling
  *    links that exercise the frontier filters).
  *  - one /robots.txt page per host disallowing /private/.
  */
object WebGen {

  case class Config(nPages: Long, nHosts: Int, megaShare: Double = 0.5,
                    /** gate: add per-host robots `Sitemap:` lines, a
                      * /sitemap.xml sitemapindex, a /sitemap-pages.xml
                      * urlset, and 3 sitemap-only orphan pages per host.
                      * OFF by default so the bench geometry is unchanged.
                      */
                    withSitemaps: Boolean = false,
                    /** gate: add an `Allow: /private/doc-*0.html$` robots
                      * line — an already-linked SUBSET of the /private/
                      * pages (p ≡ 0 mod 10) becomes fetchable, exercising
                      * RFC 9309 Allow + wildcard + $-anchor longest-match
                      * precedence end-to-end with zero geometry changes.
                      * OFF by default so the bench geometry is unchanged.
                      */
                    withAllowRule: Boolean = false) {
    require(nHosts >= 2 && nPages >= nHosts * 4L)
    require(megaShare > 0 && megaShare < 1)
    /** host sizes: host0 = megaShare of all pages (skew), remainder split
      * evenly (last host absorbs the remainder).
      */
    val sizes: Array[Long] = {
      val s = new Array[Long](nHosts)
      s(0) = (nPages * megaShare).toLong
      val rest = nPages - s(0)
      val each = rest / (nHosts - 1)
      var h = 1
      while (h < nHosts) { s(h) = each; h += 1 }
      s(nHosts - 1) += rest - each * (nHosts - 1)
      s
    }
    val offsets: Array[Long] = sizes.scanLeft(0L)(_ + _)
    def hostOf(i: Long): Int = {
      var h = java.util.Arrays.binarySearch(offsets, i)
      if (h < 0) h = -h - 2
      if (h >= nHosts) nHosts - 1 else h
    }
  }

  def hostName(h: Int): String = s"host$h.example.com"
  def base(h: Int): String = s"https://www.${hostName(h)}"
  def seeds(cfg: Config): Seq[String] = (0 until cfg.nHosts).map(h => s"${base(h)}/index.html")

  /** Path of page p on host h — pure, total. */
  def pathOf(h: Int, p: Long): String = {
    if (p == 0L) "/index.html"
    else (p % 5).toInt match {
      case 1 | 2 => s"/news/2024/03/${p % 28 + 1}/story-$p.html"
      case 3     => s"/sezione/list-$p.html"
      case 4     => s"/cronaca/item-$p.html"
      case _     => s"/private/doc-$p.html" // robots-disallowed
    }
  }

  def urlOf(h: Int, p: Long): String = base(h) + pathOf(h, p)

  /** Deterministic pseudo-words for page bodies. The skeleton interleaves
    * Italian function words (stopwords-it) so every paragraph has a
    * guaranteed stopword count > 5 — the gravity scorer's gate
    * (extractors.py:788,869) must engage deterministically.
    */
  private val words = Array("governo", "mercato", "squadra", "citta", "voto",
    "banca", "tempo", "scuola", "strada", "teatro", "giorno", "parola",
    "lavoro", "storia", "regione", "popolo")
  private val skeleton = Array("il", "della", "che", "una", "non", "sono",
    "per", "con", "anche", "come", "alla", "dei")

  private def mix(h: Int, p: Long, k: Int): Int = {
    var z = (h.toLong << 40) ^ (p * 0x9E3779B97F4A7C15L) ^ (k * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) & 0x7fffffff).toInt
  }

  def titleOf(h: Int, p: Long): String = s"Articolo $p — host$h"

  private def sentence(h: Int, p: Long, k: Int, n: Int): String =
    (0 until n).map { j =>
      val w = words(mix(h, p, k * 97 + j) % words.length)
      if (j % 2 == 1) skeleton(mix(h, p, k * 389 + j) % skeleton.length) else w
    }.mkString(" ")

  /** Pages per host reachable ONLY through the host's RSS feed (S8):
    * the last `feedOrphans(nh)` page numbers are excluded from every
    * link-target range, so fetching them proves feed ingestion.
    */
  def feedOrphans(nh: Long): Int = if (nh > 24) 4 else 0

  /** Pages per host reachable ONLY through the host's sitemap (the
    * range [nh−feed−3, nh−feed), just below the feed orphans) — fetching
    * them proves sitemap ingestion. 0 unless `cfg.withSitemaps`.
    */
  def sitemapOrphans(cfg: Config, nh: Long): Int =
    if (cfg.withSitemaps && nh > 24) 3 else 0

  /** page numbers excluded from every link-target range (feed- and
    * sitemap-only orphans).
    */
  def reservedOf(cfg: Config, nh: Long): Long =
    feedOrphans(nh).toLong + sitemapOrphans(cfg, nh)

  /** Out-link page numbers of page p within host h (intra-host, closed
    * over the non-orphan range). Fan-out ≈ 6-12 so the frontier ramps to
    * data-bound waves quickly.
    */
  def linkTargets(h: Int, p: Long, nh: Long): Seq[Long] =
    linkTargets(h, p, nh, feedOrphans(nh).toLong)

  def linkTargets(h: Int, p: Long, nh: Long, reserved: Long): Seq[Long] = {
    val span = nh - reserved // orphans stay feed/sitemap-only
    if (p == 0L) {
      // hub: fan out to the first pages of the host
      (1L until math.min(13L, span)).toSeq
    } else (p % 5).toInt match {
      case 1 | 2 => Seq(2 * p + 1, 3 * p + 2, 5 * p + 7, 7 * p + 11,
        11 * p + 13, 13 * p + 17).map(_ % span)
      case 3     => Seq(p + 1, 2 * p + 1, 7 * p + 3, 3 * p + 5, 5 * p + 11,
        9 * p + 2, 17 * p + 5, 19 * p + 7).map(_ % span)
      case 4     => Seq((p + 2) % span, (23 * p + 3) % span)
      case _     => Seq.empty
    }
  }

  /** canonical-redirect pages (ST5): sparse subsets of news template 2.
    * p ≡ 7 (mod 15): rel=canonical points at a synthetic alternate URL
    * that exists nowhere else (never linked, not in the table).
    * p ≡ 12 (mod 15): rel=canonical points at an ORDINARY page of the
    * same host — a target that other pages also link-discover, so the
    * engine's pending-upgrade path (a previously-pending target upgraded
    * to Fetched without a refetch, even when a link discovery of the
    * same key wins the same wave's candidate dedup) is exercised against
    * the RefSpec oracle rather than never generated.
    */
  def hasCanonical(p: Long): Boolean =
    p % 5 == 2 && (p % 15 == 7 || p % 15 == 12)
  def canonicalUrlOf(h: Int, p: Long, nh: Long): String =
    canonicalUrlOf(h, p, nh, feedOrphans(nh).toLong)
  def canonicalUrlOf(h: Int, p: Long, nh: Long, reserved: Long): String =
    if (p % 15 == 7) base(h) + s"/canon/alt-$p.html"
    else {
      // deterministic in-range ordinary page: never the page itself and
      // never a /private/ (robots-disallowed) template — canon
      // attribution bypasses robots by design (it is a content update,
      // not a fetch), and the test invariant "no /private/ page escapes
      // Disallowed" should stay meaningful; the span also excludes the
      // orphan block so a canon content-update can never pre-Fetch a
      // page whose only discovery path the orphan tests rely on
      val span = math.max(1L, nh - reserved)
      var q = (7 * p + 4) % span
      while (q == p || q % 5 == 0) q = (q + 1) % span
      urlOf(h, q)
    }

  /** Full page HTML — the link layout exercises every frontier filter:
    * relative + absolute hrefs, a tracking-query dup, a cross-host link,
    * a non-navigable /about link, and (template 4) a dangling news link.
    */
  def htmlOf(cfg: Config, h: Int, p: Long): String = {
    val nh = cfg.sizes(h)
    val b = base(h)
    val reserved = reservedOf(cfg, nh)
    val targets = linkTargets(h, p, nh, reserved)
    val sb = new StringBuilder(512)
    sb.append("<html lang=\"it\"><head><title>").append(titleOf(h, p))
      .append("</title>")
    if (hasCanonical(p))
      sb.append("<link rel=\"canonical\" href=\"").append(canonicalUrlOf(h, p, nh, reserved)).append("\"/>")
    if (p == 0L) // hub advertises the host feed (S8 discovery cascade)
      sb.append("<link rel=\"alternate\" type=\"application/rss+xml\" href=\"/feed.xml\" title=\"feed\"/>")
    sb.append("</head><body>")
    sb.append("<nav><a href=\"/index.html\">home</a></nav>")
    sb.append("<article><p>").append(sentence(h, p, 1, 14)).append("</p><p>")
      .append(sentence(h, p, 2, 11)).append("</p></article>")
    targets.zipWithIndex.foreach { case (tp, i) =>
      // alternate absolute/relative hrefs (relative-href fixing, F4)
      val href = if (i % 2 == 0) urlOf(h, tp) else pathOf(h, tp)
      sb.append("<a href=\"").append(href).append("\">l").append(i).append("</a>")
    }
    if (p == 0L) {
      // canonicalization dup: same target with a tracking query
      sb.append("<a href=\"").append(urlOf(h, 1L)).append("?utm_source=feed\">dup</a>")
      // non-navigable (BAD_TOKENS 'about') and cross-host (dropped by P6)
      sb.append("<a href=\"").append(b).append("/about/team.html\">about</a>")
      sb.append("<a href=\"").append(base((h + 1) % cfg.nHosts)).append("/index.html\">other</a>")
    }
    if (p % 5 == 4) // dangling news link: in-frontier but never in the table
      sb.append("<a href=\"").append(b).append(s"/news/2024/04/5/ghost-$p-missing.html").append("\">g</a>")
    sb.append("</body></html>")
    sb.toString
  }

  /** Reference-semantics extracted text of the page, hand-derived from
    * the ported pipeline (the `extract(html).text == text` byte-identity
    * is asserted by CrawlSpec/ExtractSpec):
    *  - news templates (p%5 ∈ {1,2}): gravity scoring elects the
    *    <article> node; the formatter joins its two <p> children with a
    *    single space (outputformatters.py:58-71);
    *  - all other templates fail the is-news gate
    *    (extractor.py:78) → empty text.
    */
  def textOf(h: Int, p: Long): String =
    if (p % 5 == 1 || p % 5 == 2)
      sentence(h, p, 1, 14) + " " + sentence(h, p, 2, 11)
    else ""

  val RobotsBody = "User-agent: *\nDisallow: /private/\n"

  /** the gated Allow line: longer than `Disallow: /private/`, so RFC 9309
    * most-specific-match re-opens exactly the p ≡ 0 (mod 10) private docs.
    */
  val AllowRule = "/private/doc-*0.html$"

  /** true iff page p of any host is re-opened by [[AllowRule]]. */
  def allowedPrivate(p: Long): Boolean = p % 10 == 0 && p != 0

  /** robots body for host h: the base rules, plus the gated `Allow:`
    * override and the host's `Sitemap:` advert when those layers are on.
    */
  def robotsBodyOf(cfg: Config, h: Int): String = {
    val allow = if (cfg.withAllowRule) s"Allow: $AllowRule\n" else ""
    val sm = if (cfg.withSitemaps) s"Sitemap: ${base(h)}/sitemap.xml\n" else ""
    RobotsBody + allow + sm
  }

  /** /sitemap.xml: a sitemapINDEX pointing at the host's urlset — the
    * child sitemap URL is itself a frontier candidate, so ingestion
    * exercises the two-level cascade. Comment-padded past the 200-char
    * fetch gate.
    */
  def sitemapIndexBodyOf(cfg: Config, h: Int): String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      s"<sitemap><loc>${base(h)}/sitemap-pages.xml</loc></sitemap>" +
      "</sitemapindex><!-- " + ("x" * 140) + " -->"

  /** /sitemap-pages.xml: the urlset listing the host's sitemap-only
    * orphan pages (no html link and no feed entry reaches them — S-layer
    * ingestion is the only path).
    */
  def sitemapBodyOf(cfg: Config, h: Int): String = {
    val nh = cfg.sizes(h)
    val so = sitemapOrphans(cfg, nh)
    val lo = nh - feedOrphans(nh) - so
    val urls = (lo until lo + so)
      .map(p => s"<url><loc>${urlOf(h, p)}</loc></url>").mkString
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      urls + "</urlset><!-- " + ("x" * 140) + " -->"
  }

  /** RSS 2.0 feed body for host h: one item per feed-orphan page (the
    * pages no html link reaches — S8 ingestion is the only path to
    * them). Single-line well-formed XML, >200 chars by construction.
    */
  def feedBodyOf(cfg: Config, h: Int): String = {
    val nh = cfg.sizes(h)
    val items = ((nh - feedOrphans(nh)) until nh).map { p =>
      s"<item><title>${titleOf(h, p)}</title><link>${urlOf(h, p)}</link>" +
        s"<pubDate>2024-03-0${p % 9 + 1}</pubDate></item>"
    }.mkString
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      s"""<rss version="2.0"><channel><title>host$h feed</title>""" +
      s"<link>${base(h)}</link>$items</channel></rss>" +
      // pad so even an empty-orphan feed passes the 200-char fetch gate
      "<!-- " + ("x" * 120) + " -->"
  }

  /** Total generated rows (pages + per-host robots + feed rows, plus
    * per-host sitemapindex + urlset rows when the sitemap layer is on).
    */
  def totalRows(cfg: Config): Long =
    cfg.nPages + 2L * cfg.nHosts +
      (if (cfg.withSitemaps) 2L * cfg.nHosts else 0L)

  /** Row i of the generated table: pages [0, nPages), robots rows
    * [nPages, nPages+H), feed rows [nPages+H, nPages+2H); with sitemaps
    * on, sitemapindex rows [nPages+2H, nPages+3H) and urlset rows
    * [nPages+3H, nPages+4H).
    */
  def rowAt(cfg: Config, i: Long): (String, Long, Array[Byte], String, String) = {
    val ts = 1700000000L + i
    if (i >= cfg.nPages + 3L * cfg.nHosts) {
      val h = (i - cfg.nPages - 3L * cfg.nHosts).toInt
      val body = sitemapBodyOf(cfg, h)
      (s"${base(h)}/sitemap-pages.xml", ts, body.getBytes("UTF-8"), "", "")
    } else if (i >= cfg.nPages + 2L * cfg.nHosts) {
      val h = (i - cfg.nPages - 2L * cfg.nHosts).toInt
      val body = sitemapIndexBodyOf(cfg, h)
      (s"${base(h)}/sitemap.xml", ts, body.getBytes("UTF-8"), "", "")
    } else if (i >= cfg.nPages + cfg.nHosts) {
      val h = (i - cfg.nPages - cfg.nHosts).toInt
      val body = feedBodyOf(cfg, h)
      (s"${base(h)}/feed.xml", ts, body.getBytes("UTF-8"), "", "")
    } else if (i >= cfg.nPages) {
      val h = (i - cfg.nPages).toInt
      val body = robotsBodyOf(cfg, h)
      (s"${base(h)}/robots.txt", ts, body.getBytes("UTF-8"), body, "")
    } else {
      val h = cfg.hostOf(i)
      val p = i - cfg.offsets(h)
      val html = htmlOf(cfg, h, p)
      (urlOf(h, p), ts, html.getBytes("UTF-8"), textOf(h, p), "it")
    }
  }

  /** Distributed generation → DataFrame(url, warc_ts, html, text, lang). */
  def generate(spark: SparkSession, cfg: Config): DataFrame = {
    import spark.implicits._
    spark.range(totalRows(cfg))
      .mapPartitions { it =>
        it.map { i => WebGen.rowAt(cfg, i) }
      }
      .toDF("url", "ts_s", "html", "text", "lang")
      .withColumn("warc_ts", timestamp_seconds($"ts_s")).drop("ts_s")
      .select($"url", $"warc_ts", $"html", $"text", $"lang")
  }

  /** Generate and persist as the crawl input table, partition-pruned by
    * host-hash bucket directory (pmod(xxhash64(url),64)) — the stand-in
    * for Iceberg bucket partitioning (SURVEY.md §7.0).
    */
  def writeTable(spark: SparkSession, cfg: Config, path: String): Unit =
    generate(spark, cfg)
      .withColumn("bucket", pmod(xxhash64($"url"), lit(64)))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
}
