package graft
package crawl

/** Typed data model of the crawl engine (SURVEY.md §1).
  *
  * The reference keeps frontier + visited-set + article store in one SQLite
  * `pages` table (UNIQUE url, scraped/attempts flags —
  * /root/reference/storage_tools/_datacollector_statements.py:10-30). Here
  * the same information is a typed Dataset snapshotted per wave; articles
  * are appended to a separate output so frontier state rows stay narrow
  * (bookkeeping only — the shuffled state at 10^10 urls must not carry
  * article bodies).
  */
object Status {
  val Pending = 0
  val Fetched = 1
  val Failed = 2     // finalized after MaxAttempts (reference code -1 path,
                     // /root/reference/crawling_tools/crawler.py:405-417)
  val Disallowed = 3 // robots-filtered (new-engine requirement; the
                     // reference has no robots handling)
  val Redirected = 4 // canonical target re-enqueued (crawler.py:102-127)
}

/** One frontier/seen-set row. `urlKey = xxhash64(canonicalKey(url))` is the
  * exact dedup identity (scheme-stripped cleaned url — matching the
  * reference's UNIQUE key, /root/reference/utils.py:334-340).
  *
  * Discovery order is the triple (discWave, parentRank, linkIdx): the
  * deterministic total order that replaces the reference's dict-insertion
  * FIFO (/root/reference/crawling_tools/crawler.py:335-347) — no global
  * sequence counter, so assignment needs no single-partition shuffle.
  */
case class FrontierRow(
    urlKey: Long,
    url: String, // canonical, scheme kept
    host: String, // principal domain (politeness + partition key)
    hostRank: Int, // seed order of the host (ordering-equivalence key)
    isWebnews: Boolean,
    discWave: Int,
    parentRank: Long, // scheduled rank of the discovering page within its wave
    linkIdx: Int, // position of the href in the discovering page
    status: Int,
    attempts: Int,
    fetchWave: Int, // -1 until fetched
    scheduledRank: Long, // rank within (fetchWave, host); -1 until fetched
    urlToRefer: String) // redirect source, null otherwise

/** Extracted article emitted per fetched page. */
case class ArticleRow(
    urlKey: Long,
    url: String,
    host: String,
    fetchWave: Int,
    title: String,
    text: String,
    lang: String,
    isWebnewsMeta: Boolean,
    nLinks: Int)

/** A fetched + parsed page in flight during a wave (public top-level so
  * Catalyst codegen can construct it). `redirectTo` carries the
  * canonical-redirect target when rel=canonical disagrees with the url
  * (ST5, /root/reference/crawling_tools/crawler.py:102-106).
  */
case class FetchedPage(urlKey: Long, ckey: String, url: String,
    host: String, hostRank: Int, isWebnews: Boolean, discWave: Int,
    parentRank: Long, linkIdx: Int, attempts: Int, scheduledRank: Long,
    title: String, text: String, language: String, publishDate: String,
    authors: Seq[String], videos: Seq[String], sections: Seq[String],
    topImage: String, isWebnewsMeta: Boolean, redirectTo: String,
    links: Seq[String],
    /** true = the fetch join MISSED (no capture for this url): the row
      * carries only its scheduling fields and feeds the retry fold —
      * riding in the parse output keeps misses out of a separate
      * anti-join stage in the wave-commit plan
      */
    isMiss: Boolean)

/** Column lists shared by the crawl job and the delta store (the store
  * slices the single per-wave partitioned write back into state rows vs
  * article rows by column set).
  */
object FrontierSchema {
  import org.apache.spark.sql.types._

  val stateColNames: Seq[String] = Seq("urlKey", "ckey", "url", "host",
    "hostRank", "isWebnews", "discWave", "parentRank", "linkIdx", "status",
    "attempts", "fetchWave", "scheduledRank", "urlToRefer")
  val articleColNames: Seq[String] = Seq("urlKey", "url", "host",
    "fetchWave", "title", "text", "language", "publishDate", "authors",
    "videos", "sections", "topImage", "isWebnewsMeta", "nLinks")

  /** Schema of a compacted pending base (exactly the state columns). */
  val stateSchema: StructType = StructType(Seq(
    StructField("urlKey", LongType), StructField("ckey", StringType),
    StructField("url", StringType), StructField("host", StringType),
    StructField("hostRank", IntegerType),
    StructField("isWebnews", BooleanType),
    StructField("discWave", IntegerType),
    StructField("parentRank", LongType), StructField("linkIdx", IntegerType),
    StructField("status", IntegerType), StructField("attempts", IntegerType),
    StructField("fetchWave", IntegerType),
    StructField("scheduledRank", LongType),
    StructField("urlToRefer", StringType)))

  /** Superset schema of every `_kind` slice of a wave delta (state cols ∪
    * article-only cols — the single partitioned write's union schema).
    * Passing it explicitly to every store read skips parquet
    * schema-inference footer jobs — a measured per-wave driver cost that
    * grows with the delta-dir count.
    */
  val deltaSchema: StructType = StructType(stateSchema.fields ++ Seq(
    StructField("title", StringType), StructField("text", StringType),
    StructField("language", StringType),
    StructField("publishDate", StringType),
    StructField("authors", ArrayType(StringType)),
    StructField("videos", ArrayType(StringType)),
    StructField("sections", ArrayType(StringType)),
    StructField("topImage", StringType),
    StructField("isWebnewsMeta", BooleanType),
    StructField("nLinks", IntegerType)))

  /** Keys-log projection (urlKey only — the seen-set join side). */
  val keySchema: StructType =
    StructType(Seq(StructField("urlKey", LongType)))
}

/** Per-wave metrics, written into the snapshot manifest (the Spark-native
  * replacement of the reference's curses dashboard counters,
  * /root/reference/crawling_tools/crawler_manager.py:87-122).
  */
case class WaveMetrics(
    wave: Int,
    scheduled: Long,
    fetched: Long,
    failedFinal: Long,
    retried: Long,
    newLinks: Long,
    dupLinks: Long,
    disallowed: Long,
    pendingAfter: Long)
