package graft
package crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The distributed crawl: batch-iterative frontier waves over the input
  * pages table (BASELINE.json input_hint shape), replacing the reference's
  * threads+SQLite loop (/root/reference/crawling_tools/crawler.py:65-88)
  * with declarative per-wave plans — scan/joins/windows that Catalyst
  * plans and AQE re-plans at runtime.
  *
  * Wave w (state snapshot w → snapshot w+1):
  *   1. eligible = pending ∧ attempts < maxAttempts            (P11/P12)
  *   2. wave     = per-host priority top-B                     (A4/W1/W3)
  *   3. fetch    = wave ⋈ pages on urlKey (+ ckey equality
  *                 backstop against 64-bit collisions)         (J5/S4)
  *   4. parse    = mapPartitions(PageParse) → articles + links (F-layer)
  *   5. expand   = posexplode(links) → canonicalize → robots
  *                 → wave-local dedup (min discovery tuple)    (P1-P9/SO4)
  *   6. new      = candidates anti-join seen (Bloom prefilter) (J1)
  *   7. fold     = state left-join wave results + union new    (S6/S7)
  *   8. commit   = snapshot + articles + manifest (atomic)     (ST4)
  *
  * Scale notes: state and candidates shuffle on the 8-byte urlKey, never
  * on url strings; the politeness window is the only host-keyed stage and
  * is skew-bounded (Scheduler); articles leave the state fold entirely;
  * per-wave lineage is truncated by reading the committed snapshot back
  * from disk (no unbounded iterative plan growth).
  */
object CrawlJob {

  case class Config(
      pagesPath: String,
      storeRoot: String,
      seeds: Seq[String],
      hostBudget: Int = 6,
      maxAttempts: Int = 2,
      maxWaves: Int = 10000,
      /** ≤ 0 disables the Bloom prefilter (plain anti-join). */
      bloomFpp: Double = 0.03,
      /** expected total distinct URLs (sizes the mergeable Bloom
        * geometry); 0 → derived from the pages-table row count
        */
      expectedTotalUrls: Long = 0L,
      /** cache the urlKey-pre-partitioned pages table across waves (the
        * local stand-in for an Iceberg bucket-partitioned table +
        * storage-partitioned join: one shuffle for the whole crawl, not
        * one per wave)
        */
      cachePages: Boolean = true,
      /** bench mode: skip per-wave metric actions + lineage manifests —
        * only the data path runs (same results, fewer driver round-trips)
        */
      lean: Boolean = false)

  /** scheme-stripped canonical key, in-plan (matches the reference's
    * UNIQUE key = url minus scheme, /root/reference/utils.py:334-340).
    */
  private def ckeyOf(url: org.apache.spark.sql.Column) =
    regexp_replace(url, "^https?://", "")

  /** Input pages keyed for the fetch join. Only (urlKey, ckey, url, html)
    * — column pruning keeps text/lang out of the fetch scan.
    */
  def keyedPages(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(cfg.pagesPath)
      .select($"url", $"html")
      .withColumn("ckey", ckeyOf($"url"))
      .withColumn("urlKey", xxhash64($"ckey"))

  /** robots.txt rules per host, collected once (tiny: ≤1 row/host). */
  def robotsRules(spark: SparkSession, cfg: Config): Map[String, Seq[String]] =
    spark.read.parquet(cfg.pagesPath)
      .filter($"url".endsWith("/robots.txt"))
      .select($"url", $"text")
      .collect()
      .map { r =>
        val host = UrlOps.getPrincipalDomain(r.getString(0))
        host -> Robots.parse(r.getString(1))
      }.toMap

  /** S1 — seed-list scan (utils.py:199-202): text file, one URL per
    * line, blanks dropped, order preserved (order defines hostRank).
    */
  def seedsFromFile(spark: SparkSession, path: String): Seq[String] =
    spark.read.textFile(path).collect()
      .map(_.trim).filter(_.nonEmpty).toSeq

  /** Seed state (wave-0 snapshot): cleaned, deduped (main.py:11-13),
    * hostRank = seed order.
    */
  def initState(spark: SparkSession, cfg: Config): DataFrame = {
    import spark.implicits._
    val rows = cfg.seeds.zipWithIndex.map { case (s, i) =>
      val cleaned = UrlOps.cleanUrl(s, removeArguments = false)
      (cleaned, UrlOps.getPrincipalDomain(cleaned), i)
    }.distinctBy(_._1)
    rows.toDF("url", "host", "hostRank")
      .withColumn("ckey", ckeyOf($"url"))
      .withColumn("urlKey", xxhash64($"ckey"))
      .withColumn("isWebnews", GraftUdfs.isNews($"url"))
      .withColumn("discWave", lit(0))
      .withColumn("parentRank", lit(-1L))
      .withColumn("linkIdx", $"hostRank")
      .withColumn("status", lit(Status.Pending))
      .withColumn("attempts", lit(0))
      .withColumn("fetchWave", lit(-1))
      .withColumn("scheduledRank", lit(-1L))
      .withColumn("urlToRefer", lit(null).cast("string"))
      .select(stateCols: _*)
  }

  private val stateColNames = Seq("urlKey", "ckey", "url", "host", "hostRank",
    "isWebnews", "discWave", "parentRank", "linkIdx", "status", "attempts",
    "fetchWave", "scheduledRank", "urlToRefer")
  private def stateCols = stateColNames.map(col)

  /** One wave's outputs. `newKeys` = urlKeys added to the seen set this
    * wave (for incremental Bloom maintenance); `cached` = persisted
    * intermediates to release after the commit.
    */
  case class WaveResult(next: DataFrame, articles: DataFrame,
      metrics: WaveMetrics, newKeys: DataFrame,
      cached: Seq[org.apache.spark.sql.Dataset[_]])

  def runWave(spark: SparkSession, state: DataFrame, pages: DataFrame,
              rules: Map[String, Seq[String]], wave: Int, cfg: Config,
              bloom: Option[org.apache.spark.util.sketch.BloomFilter]): WaveResult = {
    import spark.implicits._

    val eligible = state.filter($"status" === Status.Pending &&
      $"attempts" < cfg.maxAttempts)
    val waveSet = Scheduler.selectWave(eligible, cfg.hostBudget)
      .persist(StorageLevel.DISK_ONLY)
    val scheduled = if (cfg.lean) -1L else waveSet.count()

    // fetch: left join pages; ckey string equality guards hash collisions
    val joined = waveSet.join(
        pages.select($"urlKey", $"ckey", $"html"), Seq("urlKey", "ckey"), "left")
      .persist(StorageLevel.DISK_ONLY)

    val hits = joined.filter($"html".isNotNull)
    val parsed = hits
      .select($"urlKey", $"ckey", $"url", $"host", $"hostRank",
        $"scheduledRank", $"isWebnews", $"html")
      .as[(Long, String, String, String, Int, Long, Boolean, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (k, ck, u, h, hr, rk, wn, html) =>
          val p = PageParse.parse(html, u, wn)
          // ST5: canonical disagreement → redirect (crawler.py:102-106)
          val redirectTo =
            if (p.canonical != null && p.canonical.nonEmpty &&
                !UrlOps.areEqualsUrls(p.canonical, u)) p.canonical else null
          FetchedPage(k, ck, u, h, hr, rk, p.title, p.text, p.language,
            p.publishDate, p.authors, p.videos, p.sections, p.topImage,
            p.isWebnewsMeta, redirectTo, p.links)
        }
      }
      .persist(StorageLevel.DISK_ONLY)

    // articles: redirected pages publish their content under the
    // canonical url (reference: current_url = canonical_url before
    // _manage_extracted_data, crawler.py:105-111)
    val articleCols = Seq(
      $"title", $"text", $"language", $"publishDate", $"authors",
      $"videos", $"sections", $"topImage", $"isWebnewsMeta",
      size($"links").as("nLinks"))
    val articles = parsed.filter($"redirectTo".isNull)
      .select(Seq($"urlKey", $"url", $"host", lit(wave).as("fetchWave")) ++ articleCols: _*)
      .unionByName(parsed.filter($"redirectTo".isNotNull)
        .withColumn("curl", $"redirectTo")
        .withColumn("cckey", ckeyOf($"curl"))
        .select(Seq(xxhash64($"cckey").as("urlKey"), $"curl".as("url"),
          $"host", lit(wave).as("fetchWave")) ++ articleCols: _*))

    // frontier expansion: document-order link index, canonicalize, robots
    val rulesBc = spark.sparkContext.broadcast(rules)
    val disallowedUdf = udf((host: String, url: String) =>
      Robots.isDisallowed(rulesBc.value, host, url))
    val rawCand = parsed
      .select($"host", $"hostRank", $"scheduledRank".as("parentRank"),
        posexplode($"links").as(Seq("linkIdx", "url")))
      .withColumn("ckey", ckeyOf($"url"))
      .withColumn("urlKey", xxhash64($"ckey"))
      // native Catalyst expression (whole-stage codegen) — this runs per
      // discovered link, the highest-volume scalar in the engine
      .withColumn("isWebnews", graft.functions.UrlExpressions.is_news_url($"url"))
      .withColumn("status", when(disallowedUdf($"host", $"url"),
        Status.Disallowed).otherwise(Status.Pending))

    // wave-local dedup: keep the earliest discovery tuple per urlKey
    val cand = rawCand
      .groupBy($"urlKey", $"ckey")
      .agg(min_by(
        struct($"url", $"host", $"hostRank", $"isWebnews", $"parentRank",
          $"linkIdx", $"status"),
        struct($"parentRank", $"linkIdx")).as("r"))
      .select($"urlKey", $"ckey", $"r.url", $"r.host", $"r.hostRank",
        $"r.isWebnews", lit(wave).as("discWave"), $"r.parentRank",
        $"r.linkIdx", $"r.status", lit(0).as("attempts"),
        lit(-1).as("fetchWave"), lit(-1L).as("scheduledRank"),
        lit(null).cast("string").as("urlToRefer"))
      .persist(StorageLevel.DISK_ONLY)
    val candCount = if (cfg.lean) -1L else cand.count()

    val newRows = SeenSet.filterNew(cand, state, bloom)
      .persist(StorageLevel.DISK_ONLY)
    val newCount = if (cfg.lean) -1L else newRows.count()
    val disallowedCount = if (cfg.lean) -1L
      else newRows.filter($"status" === Status.Disallowed).count()

    // ST5: canonical targets enter the state as already-Fetched rows
    // (reference: INSERT OR IGNORE + immediate scraped=1 update). Canon
    // targets are never otherwise linked, but the anti-join keeps this
    // exact under any input.
    val attributed0 = SeenSet.filterNew(
      parsed.filter($"redirectTo".isNotNull)
        .select($"redirectTo".as("url"), $"host", $"hostRank",
          $"scheduledRank".as("parentRank"))
        .withColumn("ckey", ckeyOf($"url"))
        .withColumn("urlKey", xxhash64($"ckey"))
        .withColumn("isWebnews", GraftUdfs.isNews($"url"))
        .withColumn("discWave", lit(wave))
        .withColumn("linkIdx", lit(-1))
        .withColumn("status", lit(Status.Fetched))
        .withColumn("attempts", lit(0))
        .withColumn("fetchWave", lit(wave))
        .withColumn("scheduledRank", lit(-1L))
        .withColumn("urlToRefer", lit(null).cast("string"))
        .select(stateCols: _*)
        .dropDuplicates("urlKey", "ckey"),
      state, bloom)
    val attributed = attributed0.persist(StorageLevel.DISK_ONLY)

    // state fold: apply wave outcomes, then append the new discoveries
    val hitOut = parsed.select($"urlKey", $"ckey",
      $"scheduledRank".as("rk"), lit(true).as("hit"), $"redirectTo")
    val missOut = joined.filter($"html".isNull).select($"urlKey", $"ckey",
      $"scheduledRank".as("rk"), lit(false).as("hit"),
      lit(null).cast("string").as("redirectTo"))
    val outcomes = hitOut.unionByName(missOut)
    val folded = state.join(outcomes, Seq("urlKey", "ckey"), "left")
      .withColumn("status2",
        when($"hit".isNull, $"status")
          .when($"hit" && $"redirectTo".isNotNull, lit(Status.Redirected))
          .when($"hit", lit(Status.Fetched))
          .when($"attempts" + 1 >= cfg.maxAttempts, lit(Status.Failed))
          .otherwise(lit(Status.Pending)))
      .withColumn("attempts2",
        when($"hit".isNull || $"hit", $"attempts").otherwise($"attempts" + 1))
      .withColumn("fetchWave2",
        when($"hit".isNotNull && $"hit", lit(wave)).otherwise($"fetchWave"))
      .withColumn("scheduledRank2",
        when($"hit".isNotNull && $"hit", $"rk").otherwise($"scheduledRank"))
      .withColumn("urlToRefer2",
        when($"hit".isNotNull && $"hit" && $"redirectTo".isNotNull, $"redirectTo")
          .otherwise($"urlToRefer"))
      .drop("status", "attempts", "fetchWave", "scheduledRank",
        "urlToRefer", "hit", "rk", "redirectTo")
      .withColumnRenamed("status2", "status")
      .withColumnRenamed("attempts2", "attempts")
      .withColumnRenamed("fetchWave2", "fetchWave")
      .withColumnRenamed("scheduledRank2", "scheduledRank")
      .withColumnRenamed("urlToRefer2", "urlToRefer")
      .select(stateCols: _*)

    val nextState = folded
      .unionByName(newRows.select(stateCols: _*))
      .unionByName(attributed)

    val fetchedCount = if (cfg.lean) -1L else parsed.count()
    val failedFinal = if (cfg.lean) -1L else folded.filter(
      $"status" === Status.Failed && $"attempts" >= cfg.maxAttempts).count()
    val metrics = WaveMetrics(
      wave = wave,
      scheduled = scheduled,
      fetched = fetchedCount,
      failedFinal = failedFinal,
      retried = scheduled - fetchedCount,
      newLinks = newCount,
      dupLinks = candCount - newCount,
      disallowed = disallowedCount,
      pendingAfter = -1) // filled after commit from the snapshot

    val newKeys = newRows.select($"urlKey")
      .unionByName(attributed.select($"urlKey"))
    WaveResult(nextState, articles.toDF(), metrics, newKeys,
      Seq(waveSet, joined, parsed, cand, newRows, attributed))
  }

  /** Full crawl (or resume from the latest committed snapshot). Returns
    * the final committed wave id.
    */
  def run(spark: SparkSession, cfg: Config,
          stopAfterWaves: Int = Int.MaxValue): Int = {
    val store = new FrontierStore(cfg.storeRoot)
    val nShuffle = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // one upfront shuffle of the pages table on the join key, reused by
    // every wave's fetch join (Iceberg-bucketed-table stand-in)
    val pages0 = keyedPages(spark, cfg)
    val pages =
      if (cfg.cachePages)
        pages0.repartition(nShuffle, $"urlKey")
          .persist(StorageLevel.MEMORY_AND_DISK)
      else pages0
    val rules = robotsRules(spark, cfg)

    var wave = store.latestWave().getOrElse {
      val init = initState(spark, cfg)
      store.commitWave(spark, 0, init, None,
        WaveMetrics(0, 0, 0, 0, 0, cfg.seeds.size, 0, 0, cfg.seeds.size))
      0
    }
    var state = store.readState(spark, wave)

    // seen-set Bloom: built once from the current state (resume-safe),
    // then maintained incrementally with each wave's new keys
    val expected =
      if (cfg.expectedTotalUrls > 0) cfg.expectedTotalUrls
      else math.max(pages0.count() * 2, 1000L)
    var bloom: Option[org.apache.spark.util.sketch.BloomFilter] =
      if (cfg.bloomFpp <= 0) None
      else Some(SeenSet.buildBloom(state.select($"urlKey"), expected, cfg.bloomFpp))

    var wavesRun = 0
    while (wavesRun < stopAfterWaves && wave < cfg.maxWaves &&
        state.filter($"status" === Status.Pending &&
          $"attempts" < cfg.maxAttempts).limit(1).count() > 0) {
      val t0 = System.nanoTime()
      val r = runWave(spark, state, pages, rules, wave, cfg, bloom)
      store.commitWave(spark, wave + 1, r.next, Some(r.articles), r.metrics,
        withLineage = !cfg.lean)
      bloom.foreach { bf =>
        // stat.bloomFilter NPEs on an empty input (null agg buffer) —
        // a zero-new-key wave merges nothing
        if (r.newKeys.limit(1).count() > 0)
          bf.mergeInPlace(SeenSet.buildBloom(r.newKeys, expected, cfg.bloomFpp))
      }
      r.cached.foreach(_.unpersist(blocking = false))
      System.err.println(f"[crawl] wave $wave committed in ${(System.nanoTime() - t0) / 1e9}%.2fs" +
        (if (cfg.lean) ""
         else s" (scheduled=${r.metrics.scheduled} fetched=${r.metrics.fetched} new=${r.metrics.newLinks})"))
      wave += 1
      wavesRun += 1
      state = store.readState(spark, wave)
    }
    if (cfg.cachePages) pages.unpersist(blocking = false)
    wave
  }
}

/** UDF handles shared by crawl stages (constructed once, serializable). */
object GraftUdfs {
  val isNews = udf((u: String) => NewsUrl.isNewsUrl(u))
}
