package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.crawl._
import graft.synth.WebGen

/** Crawl-equivalence (SURVEY.md §5.4): the distributed engine must match
  * the sequential RefSpec oracle on fetch order, final seen-set, statuses
  * and attempts — under the same seed list + politeness budget. Plus
  * extraction invariant and kill-and-resume.
  */
class CrawlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val webCfg = WebGen.Config(nPages = 400, nHosts = 4)
  private lazy val pagesPath = {
    val dir = Files.createTempDirectory("graftweb").toString
    WebGen.writeTable(spark, webCfg, dir)
    dir
  }

  private def crawlCfg(store: String, maxWaves: Int = 10000) = CrawlJob.Config(
    pagesPath = pagesPath,
    storeRoot = store,
    seeds = WebGen.seeds(webCfg),
    hostBudget = 6,
    maxWaves = maxWaves)

  private lazy val refResult: RefSpec.SpecResult = {
    val pages = spark.read.parquet(pagesPath)
      .select($"url", $"html").collect()
      .map(r => (r.getString(0).replaceFirst("^https?://", ""),
        (r.getString(0), r.getAs[Array[Byte]]("html")))).toMap
    val rules = CrawlJob.robotsRules(spark, crawlCfg("/tmp/unused"))
    RefSpec.run(pages, WebGen.seeds(webCfg), rules, hostBudget = 6)
  }

  private lazy val sparkRun: (Int, org.apache.spark.sql.DataFrame, FrontierStore) = {
    val store = Files.createTempDirectory("graftstore").toString
    val finalWave = CrawlJob.run(spark, crawlCfg(store))
    val fs = new FrontierStore(store)
    (finalWave, fs.readState(spark, finalWave).cache(), fs)
  }

  test("fetch order matches RefSpec exactly") {
    val (_, state, _) = sparkRun
    val got = state.filter($"status" === Status.Fetched && $"scheduledRank" > 0)
      .select($"fetchWave", $"hostRank", $"scheduledRank", $"ckey")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val want = refResult.fetchOrder
    assert(got.length === want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      withClue(s"position $i") { assert(g === w) }
    }
  }

  test("final seen-set, statuses, attempts, webnews, fetchWave, urlToRefer match RefSpec") {
    val (_, state, _) = sparkRun
    val got = state.select($"ckey", $"status", $"attempts", $"isWebnews",
        $"fetchWave", $"urlToRefer")
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3),
        r.getInt(4), Option(r.getString(5)))))
      .toMap
    val want = refResult.state.map { case (ck, r) =>
      ck -> ((r.status, r.attempts, r.isWebnews, r.fetchWave,
        Option(r.urlToRefer)))
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (ck, g) => withClue(ck) { assert(g === want(ck)) } }
  }

  test("crawl touches every reachable page; robots keeps /private/ unfetched") {
    val (_, state, _) = sparkRun
    assert(state.filter($"status" === Status.Fetched).count() > 100)
    assert(state.filter($"ckey".contains("/private/") &&
      $"status" =!= Status.Disallowed).count() === 0)
    // dangling ghost links end up Failed after exactly maxAttempts
    val failed = state.filter($"status" === Status.Failed)
    assert(failed.count() > 0)
    assert(failed.filter($"attempts" =!= 2).count() === 0)
  }

  test("extracted text is byte-identical to the table's text column") {
    val (finalWave, state, fs) = sparkRun
    val articles = fs.readArticles(spark, finalWave).get
    val truth = spark.read.parquet(pagesPath).select($"url", $"text".as("expected"))
    // articles attributed via canonical redirect carry the REDIRECTING
    // page's content, not the target page's own table text — identified
    // in state as Fetched without a scheduledRank
    val attributedUrls = state
      .filter($"status" === Status.Fetched && $"scheduledRank" === -1L)
      .select($"url").collect().map(_.getString(0)).toSet
    val normal = articles.filter(!$"url".isin(attributedUrls.toSeq: _*))
    val joined = normal.join(truth, Seq("url"), "inner")
    assert(joined.count() === normal.count())
    assert(joined.filter($"text" =!= $"expected").count() === 0)
    // attributed articles: text equals the table text of one of the pages
    // that redirected to this target (min discovery-order winner)
    val sourceText = spark.read.parquet(pagesPath)
      .select($"url", $"text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val sourcesByTarget = state.filter($"status" === Status.Redirected)
      .select($"urlToRefer", $"url").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(r => sourceText(r.getString(1))).toSet
      }
    val attributed = articles.filter($"url".isin(attributedUrls.toSeq: _*)).collect()
    assert(attributed.nonEmpty)
    attributed.foreach { r =>
      val url = r.getAs[String]("url")
      withClue(url) {
        assert(sourcesByTarget(url).contains(r.getAs[String]("text")))
      }
    }
  }

  test("canonical redirects: originals Redirected, targets attributed; both template classes fire") {
    val (_, state, _) = sparkRun
    val redirected = state.filter($"status" === Status.Redirected).collect()
    assert(redirected.nonEmpty)
    val (alt, linked) = redirected.partition(
      _.getAs[String]("urlToRefer").contains("/canon/"))
    // never-linked alternate targets: every one attributed, none fetched
    assert(alt.nonEmpty)
    val altAttributed = state.filter($"ckey".contains("/canon/")).collect()
    assert(altAttributed.length === alt.map(_.getAs[String]("urlToRefer")).distinct.length)
    altAttributed.foreach { r =>
      assert(r.getAs[Int]("status") === Status.Fetched)
      assert(r.getAs[Long]("scheduledRank") === -1L)
    }
    // ADVICE r2: canonical targets that are ALSO ordinary link targets —
    // the pending-upgrade path must fire (some target Fetched with no
    // scheduledRank that is NOT a /canon/ alt page)
    assert(linked.nonEmpty)
    val upgraded = state.filter($"status" === Status.Fetched &&
      $"scheduledRank" === -1L && !$"ckey".contains("/canon/"))
    assert(upgraded.count() > 0)
  }

  test("RSS ingestion (S8): feeds fetched, feed-only entries reach the crawl") {
    val (_, state, _) = sparkRun
    // every host's feed.xml was discovered from the hub and fetched
    assert(state.filter($"ckey".endsWith("/feed.xml") &&
      $"status" === Status.Fetched).count() === webCfg.nHosts.toLong)
    // feed-only orphan pages (no html link reaches them) are in the
    // final state: fetched, or robots-disallowed for /private/ templates
    val orphans = (0 until webCfg.nHosts).flatMap { h =>
      val nh = webCfg.sizes(h)
      ((nh - WebGen.feedOrphans(nh)) until nh).map(p =>
        (WebGen.urlOf(h, p).replaceFirst("^https?://", ""),
          WebGen.pathOf(h, p).startsWith("/private/")))
    }
    assert(orphans.nonEmpty && orphans.exists(!_._2))
    val got = state.select($"ckey", $"status").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    orphans.foreach { case (ck, isPrivate) =>
      withClue(ck) {
        assert(got.contains(ck))
        if (isPrivate) assert(got(ck) === Status.Disallowed)
        // canonical-template orphans finish Redirected, the rest Fetched
        else assert(got(ck) === Status.Fetched || got(ck) === Status.Redirected)
      }
    }
  }

  test("kill-and-resume: stop after 2 waves, resume, final state identical") {
    val store2 = Files.createTempDirectory("graftstore2").toString
    val cfg2 = crawlCfg(store2)
    CrawlJob.run(spark, cfg2, stopAfterWaves = 2)
    assert(new FrontierStore(store2).latestWave().get === 2)
    val finalWave2 = CrawlJob.run(spark, cfg2) // resume
    val (finalWave, state, _) = sparkRun
    assert(finalWave2 === finalWave)
    val a = state.orderBy($"ckey")
      .select($"ckey", $"status", $"attempts", $"fetchWave", $"scheduledRank")
      .collect().toSeq
    val b = new FrontierStore(store2).readState(spark, finalWave2)
      .orderBy($"ckey")
      .select($"ckey", $"status", $"attempts", $"fetchWave", $"scheduledRank")
      .collect().toSeq
    assert(a === b)
  }

  test("snapshot expiration keeps the latest waves and resume still works") {
    val store3 = Files.createTempDirectory("graftstore3").toString
    val cfg3 = crawlCfg(store3)
    CrawlJob.run(spark, cfg3, stopAfterWaves = 4)
    val fs = new FrontierStore(store3)
    // bases exist at waves 0 and 4 (compactEvery = 4): keepLast = 2
    // retains both, so nothing may be deleted (ADVICE r2: the parameter
    // must be honored, not silently maximal)
    assert(fs.expireSnapshots(keepLast = 2) === 0)
    val removed = fs.expireSnapshots(keepLast = 1)
    assert(removed > 0)
    assert(fs.latestWave().get === 4)
    // latest state intact; articles append-log untouched
    assert(fs.readState(spark, 4).count() > 0)
    assert(fs.readArticles(spark, 4).get.count() > 0)
    // resume continues from the latest snapshot
    val w = CrawlJob.run(spark, cfg3, stopAfterWaves = 1)
    assert(w === 5)
  }

  test("in-loop snapshot expiry (keepSnapshots): kill-resume still exact") {
    // expiry wired INTO the crawl loop (VERDICT r3 #9): compaction every
    // 2 waves, only the newest base retained — and a mid-crawl kill
    // must still resume to the same final state
    val store4 = Files.createTempDirectory("graftstore4").toString
    val cfg4 = crawlCfg(store4).copy(compactEvery = 2, keepSnapshots = 1)
    CrawlJob.run(spark, cfg4, stopAfterWaves = 3)
    val fs4 = new FrontierStore(store4)
    assert(fs4.latestWave().get === 3)
    // the wave-2 compaction expired the wave-0 base
    assert(!Files.exists(java.nio.file.Paths.get(fs4.basePath(0))))
    val finalWave4 = CrawlJob.run(spark, cfg4) // resume to exhaustion
    val (finalWave, state, _) = sparkRun
    assert(finalWave4 === finalWave)
    val a = state.orderBy($"ckey")
      .select($"ckey", $"status", $"attempts", $"fetchWave", $"scheduledRank")
      .collect().toSeq
    val b = fs4.readState(spark, finalWave4).orderBy($"ckey")
      .select($"ckey", $"status", $"attempts", $"fetchWave", $"scheduledRank")
      .collect().toSeq
    assert(a === b)
  }

  test("Bloom shards align with Spark urlKey hash-partitioning (one shard per task)") {
    import spark.implicits._
    val shards = 4
    // 8 partitions = 2 × shards: every partition must map to ONE shard
    val perPartition = spark.range(20000)
      .select((xxhash64($"id")).as("urlKey"))
      .repartition(8, $"urlKey")
      .as[Long]
      .mapPartitions { it =>
        val seen = scala.collection.mutable.HashSet.empty[Int]
        it.foreach(k => seen += ShardedBloom.shardOf(k, shards))
        Iterator(seen.size)
      }
      .collect()
    assert(perPartition.forall(_ <= 1), perPartition.mkString(","))
    assert(perPartition.count(_ == 1) === 8) // and all shards are reachable
  }

  test("WebGen is deterministic and robots rules parse") {
    val r1 = WebGen.rowAt(webCfg, 17L)
    val r2 = WebGen.rowAt(webCfg, 17L)
    assert(r1._1 === r2._1 && r1._4 === r2._4)
    assert(java.util.Arrays.equals(r1._3, r2._3))
    assert(Robots.parse(WebGen.RobotsBody) === Seq("D/private/"))
    assert(Robots.isDisallowed(Map("h.com" -> Seq("D/private/")), "h.com",
      "https://www.h.com/private/doc-5.html"))
    // RFC 9309 grouping: consecutive User-agent lines form ONE group
    assert(Robots.parse("User-agent: a\nUser-agent: *\nDisallow: /x\n")
      === Seq("D/x"))
    // rules between agent lines split groups: the second group is a-only
    assert(Robots.parse(
      "User-agent: *\nDisallow: /x\nUser-agent: a\nDisallow: /y\n")
      === Seq("D/x"))
    // blank lines inside an agent run do not end the run
    assert(Robots.parse("User-agent: *\n\nUser-agent: a\nDisallow: /z\n")
      === Seq("D/z"))
  }

  test("robots named agent groups: RFC 9309 longest-match selection + Crawl-delay") {
    val body = "User-agent: BadBot\nDisallow: /\n\n" +
      "User-agent: *\nDisallow: /tmp/\nCrawl-delay: 2\n"
    // exact named group beats *, case-insensitively
    assert(Robots.rulesFor(body, "badbot") === ((Seq("D/"), 0.0)))
    assert(Robots.rulesFor(body, "BADBOT-2.1") === ((Seq("D/"), 0.0)))
    // unmatched token falls back to the * group, with its delay
    assert(Robots.rulesFor(body, "goodbot") === ((Seq("D/tmp/"), 2.0)))
    // longest matching token wins among named groups
    val b2 = "User-agent: bot\nDisallow: /a/\n" +
      "User-agent: botzilla\nDisallow: /b/\nCrawl-delay: 7\n" +
      "User-agent: *\nDisallow: /c/\n"
    assert(Robots.rulesFor(b2, "botzilla-2.0") === ((Seq("D/b/"), 7.0)))
    assert(Robots.rulesFor(b2, "botling") === ((Seq("D/a/"), 0.0)))
    assert(Robots.rulesFor(b2, "other") === ((Seq("D/c/"), 0.0)))
    // same-specificity groups merge (RFC: combine same-agent groups);
    // crawl-delay folds to the max; malformed delay values are ignored
    val b3 = "User-agent: *\nDisallow: /x/\nCrawl-delay: 1\n" +
      "User-agent: a\nDisallow: /only-a/\n" +
      "User-agent: *\nDisallow: /y/\nCrawl-delay: nope\nCrawl-delay: 3\n"
    assert(Robots.rulesFor(b3, "other") === ((Seq("D/x/", "D/y/"), 3.0)))
    // no matching group at all → allow everything
    assert(Robots.select(
      Robots.parseGroups("User-agent: a\nDisallow: /p/\n"), "b") === ((Nil, 0.0)))
  }

  test("robots Allow rules, * wildcards, $ anchor: RFC 9309 longest-match precedence") {
    def dis(body: String, url: String): Boolean =
      Robots.isDisallowedBy(Robots.parse(body), "https://www.h.com" + url)
    // Allow overrides a shorter Disallow (most-specific-match wins)
    val b1 = "User-agent: *\nDisallow: /\nAllow: /p\n"
    assert(dis(b1, "/page.html") === false)
    assert(dis(b1, "/quux") === true)
    // equal-length Allow and Disallow: Allow wins the tie
    val b2 = "User-agent: *\nDisallow: /folder\nAllow: /folder\n"
    assert(dis(b2, "/folder/x") === false)
    // a LONGER Disallow beats a shorter Allow
    val b3 = "User-agent: *\nAllow: /page\nDisallow: /*.htm\n"
    assert(dis(b3, "/page.htm") === true)
    assert(dis(b3, "/page.html") === true) // prefix-glob: .htm matches .html too
    assert(dis(b3, "/pagex") === false)
    // $ anchors at the path end; rule order in the file is irrelevant
    val b4 = "User-agent: *\nAllow: /$\nDisallow: /\n"
    assert(dis(b4, "/") === false)
    assert(dis(b4, "/x") === true)
    // mid-rule wildcard spans path segments (Google's fish example)
    val b5 = "User-agent: *\nDisallow: /fish*.php\n"
    assert(dis(b5, "/fishheads/catfish.php?id=1") === true)
    assert(dis(b5, "/fish.html") === false)
    // RFC 9309 matches path PLUS query: '?'-targeting rules must fire
    // (ADVICE r4 — the r4 matcher dropped the query before matching)
    val b5q = "User-agent: *\nDisallow: /*?sessionid=\nDisallow: /search?q=\n"
    assert(dis(b5q, "/cart?sessionid=abc") === true)
    assert(dis(b5q, "/search?q=x") === true)
    assert(dis(b5q, "/search") === false)
    assert(dis(b5q, "/cart") === false)
    // ...and a $-anchored rule no longer matches a URL carrying a query
    val b5a = "User-agent: *\nDisallow: /page$\n"
    assert(dis(b5a, "/page") === true)
    assert(dis(b5a, "/page?x=1") === false)
    // anchored rule with a wildcard: *$ family
    val b6 = "User-agent: *\nDisallow: /*.php$\n"
    assert(dis(b6, "/a/b.php") === true)
    assert(dis(b6, "/a/b.phpx") === false)
    // backtracking: second star candidate must be found
    assert(Robots.pathMatches("/a*c*d$", "/abcxcd") === true)
    assert(Robots.pathMatches("/a*c*d$", "/abcxce") === false)
    // empty Allow/Disallow lines are ignored (allow all)
    assert(Robots.parse("User-agent: *\nDisallow:\nAllow:\n") === Nil)
    // encoded list is sorted (len desc, Allow first on ties) for first-match-wins
    assert(Robots.parse("User-agent: *\nDisallow: /folder\nAllow: /folder\nDisallow: /x\n")
      === Seq("A/folder", "D/folder", "D/x"))
  }

  test("robots Allow override re-opens a /private/ subset; engine matches RefSpec") {
    val cfgW = WebGen.Config(nPages = 400, nHosts = 4, withAllowRule = true)
    val dir = Files.createTempDirectory("graftweballow").toString
    WebGen.writeTable(spark, cfgW, dir)
    val store = Files.createTempDirectory("graftstoreallow").toString
    val cfg = CrawlJob.Config(pagesPath = dir, storeRoot = store,
      seeds = WebGen.seeds(cfgW), hostBudget = 6)
    val finalWave = CrawlJob.run(spark, cfg)
    val state = new FrontierStore(store).readState(spark, finalWave).cache()
    val priv = state.filter($"ckey".contains("/private/"))
      .select($"ckey", $"status").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toSeq
    assert(priv.nonEmpty)
    // the Allow: /private/doc-*0.html$ subset is FETCHED, the rest of
    // /private/ stays Disallowed — wildcard + $ + longest-match, in-plan
    val (open, closed) = priv.partition(_._1.matches(".*/private/doc-\\d*0\\.html"))
    assert(open.nonEmpty && closed.nonEmpty)
    assert(open.forall(_._2 === Status.Fetched),
      open.filterNot(_._2 == Status.Fetched).take(3).toString)
    assert(closed.forall(_._2 === Status.Disallowed),
      closed.filterNot(_._2 == Status.Disallowed).take(3).toString)
    // full fetch-order equivalence vs the sequential oracle
    val pages = spark.read.parquet(dir)
      .select($"url", $"html").collect()
      .map(r => (r.getString(0).replaceFirst("^https?://", ""),
        (r.getString(0), r.getAs[Array[Byte]]("html")))).toMap
    val want = RefSpec.run(pages, WebGen.seeds(cfgW),
      CrawlJob.robotsRules(spark, cfg), hostBudget = 6)
    val gotOrder = state.filter($"status" === Status.Fetched && $"scheduledRank" > 0)
      .select($"fetchWave", $"hostRank", $"scheduledRank", $"ckey")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(gotOrder.toSeq === want.fetchOrder)
    state.unpersist(blocking = false)
  }

  test("sitemap discovery: robots Sitemap lines seed the frontier; sitemap-only pages fetched; engine matches RefSpec") {
    val cfgW = WebGen.Config(nPages = 400, nHosts = 4, withSitemaps = true)
    val dir = Files.createTempDirectory("graftwebsm").toString
    WebGen.writeTable(spark, cfgW, dir)
    val store = Files.createTempDirectory("graftstoresm").toString
    val cfg = CrawlJob.Config(pagesPath = dir, storeRoot = store,
      seeds = WebGen.seeds(cfgW), hostBudget = 6, discoverSitemaps = true)
    // robots advertises exactly one sitemap per host, robots-url order
    val smSeeds = CrawlJob.sitemapSeeds(spark, cfg)
    assert(smSeeds.length === cfgW.nHosts)
    assert(smSeeds.forall(_.endsWith("/sitemap.xml")))
    val finalWave = CrawlJob.run(spark, cfg)
    val state = new FrontierStore(store).readState(spark, finalWave).cache()
    // the index AND the child urlset were fetched for every host (the
    // two-level sitemapindex → urlset cascade resolved through crawling)
    assert(state.filter($"ckey".endsWith("/sitemap.xml") &&
      $"status" === Status.Fetched).count() === cfgW.nHosts.toLong)
    assert(state.filter($"ckey".endsWith("/sitemap-pages.xml") &&
      $"status" === Status.Fetched).count() === cfgW.nHosts.toLong)
    // sitemap-only orphan pages (no html link, no feed entry) reached the
    // crawl: Fetched (or Disallowed/Redirected per their template)
    val got = state.select($"ckey", $"status").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    var checked = 0
    (0 until cfgW.nHosts).foreach { h =>
      val nh = cfgW.sizes(h)
      val so = WebGen.sitemapOrphans(cfgW, nh)
      assert(so > 0)
      val lo = nh - WebGen.feedOrphans(nh) - so
      (lo until lo + so).foreach { p =>
        val ck = WebGen.urlOf(h, p).replaceFirst("^https?://", "")
        withClue(ck) {
          assert(got.contains(ck))
          if (WebGen.pathOf(h, p).startsWith("/private/"))
            assert(got(ck) === Status.Disallowed)
          else
            assert(got(ck) === Status.Fetched || got(ck) === Status.Redirected)
        }
        checked += 1
      }
    }
    assert(checked > 0)
    // full fetch-order equivalence vs the oracle under the same seed list
    val pages = spark.read.parquet(dir)
      .select($"url", $"html").collect()
      .map(r => (r.getString(0).replaceFirst("^https?://", ""),
        (r.getString(0), r.getAs[Array[Byte]]("html")))).toMap
    val want = RefSpec.run(pages, WebGen.seeds(cfgW) ++ smSeeds,
      CrawlJob.robotsRules(spark, cfg), hostBudget = 6)
    val gotOrder = state.filter($"status" === Status.Fetched && $"scheduledRank" > 0)
      .select($"fetchWave", $"hostRank", $"scheduledRank", $"ckey")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(gotOrder.toSeq === want.fetchOrder)
    state.unpersist(blocking = false)
  }

  test("Crawl-delay floors the per-host wave budget; engine matches RefSpec") {
    // host 1's robots gains a graftbot group with Crawl-delay 30 →
    // cap = min(6, ⌊60/30⌋) = 2 per wave; other hosts keep budget 6
    val delayBody = "User-agent: graftbot\nDisallow: /private/\nCrawl-delay: 30\n\n" +
      WebGen.RobotsBody
    val delayedRobotsUrl = s"${WebGen.base(1)}/robots.txt"
    val dir = Files.createTempDirectory("graftwebdelay").toString
    WebGen.generate(spark, webCfg)
      .withColumn("text", when($"url" === delayedRobotsUrl, lit(delayBody))
        .otherwise($"text"))
      .withColumn("html", when($"url" === delayedRobotsUrl,
        lit(delayBody.getBytes("UTF-8"))).otherwise($"html"))
      .write.mode("overwrite").parquet(dir)
    val store = Files.createTempDirectory("graftstoredelay").toString
    val cfg = crawlCfg(store).copy(pagesPath = dir, maxWaves = 6)
    // the engine's group selection picks the graftbot group (delay 30);
    // RefSpec gets the SAME derived rules + caps
    val caps = CrawlJob.refHostCaps(spark, cfg)
    assert(caps === Map(s"host1.example.com" -> 2))
    val finalWave = CrawlJob.run(spark, cfg)
    val fs = new FrontierStore(store)
    val state = fs.readState(spark, finalWave).cache()
    // the delayed host never schedules more than 2 per wave; an
    // un-delayed host reaches the full budget
    val maxRank = state.filter($"scheduledRank" > 0)
      .groupBy($"host").agg(max($"scheduledRank").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(maxRank("host1.example.com") === 2L)
    assert(maxRank.exists { case (h, m) => h != "host1.example.com" && m > 2L })
    // full equivalence vs the oracle under the same caps
    val pages = spark.read.parquet(dir)
      .select($"url", $"html").collect()
      .map(r => (r.getString(0).replaceFirst("^https?://", ""),
        (r.getString(0), r.getAs[Array[Byte]]("html")))).toMap
    val want = RefSpec.run(pages, WebGen.seeds(webCfg),
      CrawlJob.robotsRules(spark, cfg), hostBudget = 6,
      maxWaves = 6, hostCaps = caps)
    val got = state.filter($"status" === Status.Fetched && $"scheduledRank" > 0)
      .select($"fetchWave", $"hostRank", $"scheduledRank", $"ckey")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq === want.fetchOrder)
    state.unpersist(blocking = false)
  }
}
