package graft
package crawl

import scala.collection.mutable

/** Single-threaded executable specification of the reference crawl loop
  * (SURVEY.md §5.4): refill webnews-first, discovery-FIFO within class,
  * per-host budget, retry cap 2 (/root/reference/crawling_tools/
  * crawler.py:335-347,376-393, storage_tools/datacollector.py:171-205).
  *
  * Shares [[PageParse]]/[[UrlOps]]/[[NewsUrl]]/[[Robots]] with the Spark
  * engine, so equivalence tests pin down the DISTRIBUTED semantics (wave
  * scheduling, dedup, state fold) against this plain-collections oracle.
  * Plain mutable maps, no Spark — the "what" with none of the "how".
  */
object RefSpec {

  case class SpecRow(url: String, ckey: String, host: String, hostRank: Int,
      isWebnews: Boolean, discWave: Int, parentRank: Long, linkIdx: Int,
      var status: Int, var attempts: Int, var fetchWave: Int,
      var scheduledRank: Long, var urlToRefer: String = null)

  case class SpecResult(
      fetchOrder: Vector[(Int, Int, Long, String)], // (wave, hostRank, rank, ckey)
      state: Map[String, SpecRow],
      waves: Int)

  private def ckeyOf(u: String): String = u.replaceFirst("^https?://", "")

  def run(pages: Map[String, (String, Array[Byte])], // ckey -> (url, html)
          seeds: Seq[String],
          rules: Map[String, Seq[String]],
          hostBudget: Int,
          maxAttempts: Int = 2,
          maxWaves: Int = 10000,
          /** per-host Crawl-delay budget caps (host → cap < hostBudget);
            * absent hosts use the full budget — mirrors
            * CrawlJob.hostCapsDf / Scheduler.selectWave
            */
          hostCaps: Map[String, Int] = Map.empty): SpecResult = {

    val state = mutable.LinkedHashMap.empty[String, SpecRow]
    seeds.map(s => UrlOps.cleanUrl(s, removeArguments = false))
      .zipWithIndex
      .distinctBy(_._1)
      .foreach { case (u, i) =>
        val ck = ckeyOf(u)
        state(ck) = SpecRow(u, ck, UrlOps.getPrincipalDomain(u), i,
          NewsUrl.isNewsUrl(u), 0, -1L, i, Status.Pending, 0, -1, -1L)
      }

    val fetchOrder = Vector.newBuilder[(Int, Int, Long, String)]
    var wave = 0
    var progress = true
    while (progress && wave < maxWaves) {
      val eligible = state.values
        .filter(r => r.status == Status.Pending && r.attempts < maxAttempts)
        .toVector
      if (eligible.isEmpty) progress = false
      else {
        // per-host priority top-B (same total order as Scheduler)
        val waveSet = eligible.groupBy(_.host).toVector.flatMap { case (h, rows) =>
          rows.sortBy(r =>
              (if (r.isWebnews) 0 else 1, r.discWave, r.parentRank, r.linkIdx))
            .take(hostCaps.getOrElse(h, hostBudget))
            .zipWithIndex.map { case (r, i) => (r, i + 1L) }
        }
        // deterministic processing order for discovery bookkeeping
        val ordered = waveSet.sortBy { case (r, rk) => (r.hostRank, rk) }
        val waveKeys = waveSet.map(_._1.ckey).toSet

        // wave-local discovery dedup: first (parentRank, linkIdx) wins
        val candidates = mutable.LinkedHashMap.empty[String, SpecRow]
        ordered.foreach { case (r, rk) =>
          pages.get(r.ckey) match {
            case Some((pageUrl, html)) =>
              val parsed = PageParse.parse(html, pageUrl, r.isWebnews)
              val redirectTo =
                if (parsed.canonical != null && parsed.canonical.nonEmpty &&
                    !UrlOps.areEqualsUrls(parsed.canonical, pageUrl))
                  parsed.canonical
                else null
              r.fetchWave = wave
              r.scheduledRank = rk
              if (redirectTo == null) {
                r.status = Status.Fetched
                fetchOrder += ((wave, r.hostRank, rk, r.ckey))
              } else {
                // ST5: original marked redirected; canonical target enters
                // the state as already-Fetched (content attributed there)
                r.status = Status.Redirected
                r.urlToRefer = redirectTo
                val ck = ckeyOf(redirectTo)
                state.get(ck) match {
                  case Some(t) =>
                    // already-known pending target: upgraded to Fetched
                    // without a refetch (reference UPDATE … WHERE url=?
                    // AND scraped=0, crawler.py:145-149); a target
                    // scheduled THIS wave keeps its own fetch outcome
                    if (t.status == Status.Pending && !waveKeys.contains(ck)) {
                      t.status = Status.Fetched
                      t.fetchWave = wave
                    }
                  case None =>
                    if (!candidates.contains(ck))
                      candidates(ck) = SpecRow(redirectTo, ck, r.host, r.hostRank,
                        NewsUrl.isNewsUrl(redirectTo), wave, rk, -1,
                        Status.Fetched, 0, wave, -1L)
                }
              }
              parsed.links.zipWithIndex.foreach { case (link, li) =>
                val ck = ckeyOf(link)
                if (!state.contains(ck) && !candidates.contains(ck)) {
                  val st =
                    if (Robots.isDisallowed(rules, r.host, link)) Status.Disallowed
                    else Status.Pending
                  candidates(ck) = SpecRow(link, ck, r.host, r.hostRank,
                    NewsUrl.isNewsUrl(link), wave, rk, li, st, 0, -1, -1L)
                }
              }
            case None =>
              r.attempts += 1
              if (r.attempts >= maxAttempts) r.status = Status.Failed
          }
        }
        candidates.foreach { case (ck, row) => state(ck) = row }
        wave += 1
      }
    }
    SpecResult(fetchOrder.result(), state.toMap, wave)
  }
}
