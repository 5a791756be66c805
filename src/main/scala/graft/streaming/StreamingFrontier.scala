package graft
package streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming frontier scheduling: per-host politeness budget as
  * a `groupByKey(host).flatMapGroupsWithState` operator (ST3/W1 in
  * SURVEY.md §2.8; the north rule names exactly this shape).
  *
  * This is the streaming-native counterpart of the batch
  * [[graft.crawl.Scheduler]]: candidates stream in (discovered links),
  * each trigger emits at most `budget` URLs per host in the reference's
  * priority order (webnews first, then discovery order —
  * /root/reference/storage_tools/datacollector.py:171-205), and the
  * un-emitted remainder persists in group state. Checkpointing the query
  * makes every emitted fetch wave resumable (ST4) — state lives in the
  * Structured Streaming state store.
  *
  * BOUNDED STATE (a mega-host must not grow state without limit):
  *  - pending queue capped at `maxPending` (keep the best-priority
  *    entries; overflow dropped — the reference's in-memory work dict is
  *    likewise bounded at ~200, crawler.py:387);
  *  - seen-ness is tracked as genuine 64-bit hashes capped at
  *    `maxSeenKeys` — a BEST-EFFORT wave-local dedup in O(1) memory per
  *    key; EXACT global dedup is the batch layer's job
  *    ([[graft.crawl.SeenSet]] anti-join). TRIMMING can only cause a
  *    duplicate emission; a hash COLLISION would drop a genuinely new
  *    URL, which is why [[urlKey]] is a full-strength 64-bit hash
  *    (collision odds ~10^-8 at the cap, vs ~30 expected pairs for a
  *    32-bit composite).
  *
  * POLITENESS RATE (`minDelayMs`): after emitting a batch for a host the
  * state records `nextFetchTime`; candidates arriving inside the
  * cooldown window are buffered and a ProcessingTimeTimeout is armed so
  * the host re-emits when the window expires even with no new input —
  * the streaming analogue of the reference's per-host worker-cap pacing
  * (crawler.py:22,66-77).
  */
object StreamingFrontier {

  /** `delayMs`: per-host robots `Crawl-delay` in milliseconds, riding ON
    * the candidate (the rules table is joined into the candidate stream
    * upstream, in-plan — scalable to 10^8 hosts, unlike a driver-held
    * host→delay map). 0 = no host delay; the effective cooldown is
    * max(minDelayMs, delayMs).
    */
  case class Candidate(url: String, host: String, isWebnews: Boolean,
                       discSeq: Long, delayMs: Long = 0L)
  case class ScheduledFetch(url: String, host: String, rank: Long)
  case class HostState(pending: List[Candidate], seenKeys: Set[Long],
                       emitted: Long, nextFetchTime: Long)

  /** priority: webnews first, then discovery sequence. */
  private def prio(c: Candidate): (Boolean, Long) = (!c.isWebnews, c.discSeq)

  /** Genuine 64-bit hash (FNV-1a over UTF-8 bytes + avalanche finalizer)
    * for seen tracking. NOTE the asymmetry between the two bounded-state
    * mechanisms: TRIMMING the seen set (maxSeenKeys) can only cause a
    * duplicate emission (the batch layer's exact anti-join catches it);
    * a hash COLLISION would make a genuinely new URL test as seen and
    * silently drop it — so the key must be a real 64-bit hash, where the
    * birthday collision probability at 500k keys/host is ~10^-8, not the
    * ~30 expected pairs a 32-bit-hash composite gives.
    */
  private[streaming] def urlKey(u: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = u.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    // fmix64 avalanche (MurmurHash3 finalizer) on top of FNV-1a
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** `hostDelays`: set true when candidates may carry per-host
    * `Crawl-delay` values (`Candidate.delayMs`) even with
    * `minDelayMs == 0` — it keeps the ProcessingTimeTimeout machinery
    * on so delayed hosts get their cooldown wakeups.
    */
  def scheduleFn(budget: Int, maxPending: Int, maxSeenKeys: Int,
                 minDelayMs: Long, hostDelays: Boolean = false)(
      host: String, in: Iterator[Candidate],
      state: GroupState[HostState]): Iterator[ScheduledFetch] = {
    val cur = state.getOption.getOrElse(HostState(Nil, Set.empty, 0L, 0L))
    // seen-set dedup (J1 per host, best-effort bounded) + merge, priority order
    val fresh = in.toList.filter(c => !cur.seenKeys.contains(urlKey(c.url)))
      .distinctBy(_.url)
    val all = (cur.pending ++ fresh).sortBy(prio)
    // effective cooldown: global floor ∨ the host's robots Crawl-delay
    // (uniform per host; fold defends against mixed upstream values)
    val delayMs = all.foldLeft(minDelayMs)((m, c) => math.max(m, c.delayMs))
    val cooling = minDelayMs > 0 || hostDelays
    val now = if (cooling) state.getCurrentProcessingTimeMs() else 0L

    def bound(keys: Set[Long]): Set[Long] =
      if (keys.size <= maxSeenKeys) keys else keys.take(maxSeenKeys)

    if (cooling && !state.hasTimedOut && now < cur.nextFetchTime) {
      // cooldown: buffer only (bounded), re-arm the wakeup
      val bounded = all.take(maxPending)
      state.update(cur.copy(
        pending = bounded,
        seenKeys = bound(cur.seenKeys ++ bounded.map(c => urlKey(c.url)))))
      state.setTimeoutDuration(math.max(cur.nextFetchTime - now, 1L))
      Iterator.empty
    } else {
      val (emit, rest) = all.splitAt(budget)
      val bounded = rest.take(maxPending)
      state.update(HostState(
        bounded,
        bound(cur.seenKeys ++ emit.map(c => urlKey(c.url))
          ++ bounded.map(c => urlKey(c.url))),
        cur.emitted + emit.length,
        if (delayMs > 0) now + delayMs else 0L))
      // backlog remains → wake this host up after the politeness window.
      // A zero-delay host still gets a (next-batch) wakeup when the
      // timeout machinery is on: without it, its backlog would drain
      // only when NEW input arrives for that host — flatMapGroupsWithState
      // never calls a group that has neither input nor a timeout.
      if (cooling && bounded.nonEmpty)
        state.setTimeoutDuration(math.max(delayMs, 1L))
      emit.iterator.zipWithIndex.map { case (c, i) =>
        ScheduledFetch(c.url, host, cur.emitted + i + 1)
      }
    }
  }

  /** Candidate preparation for the streaming path — the documented seam
    * between link discovery and [[schedule]] (VERDICT r4: the batch path
    * filters robots_disallowed at CrawlJob.scala's expansion; streamed
    * candidates had no in-plan equivalent). Joins the raw candidate
    * stream (columns `url`, `host`, `isWebnews`, `discSeq`) to the
    * STATIC robots rules table ([[graft.crawl.CrawlJob.robotsRulesDf]]
    * shape: host, rules, crawl_delay), DROPS disallowed URLs via the
    * same codegen'd [[graft.functions.UrlExpressions.robots_disallowed]]
    * predicate the batch engine runs, and attaches the host's
    * `Crawl-delay` as `delayMs` so [[schedule]]'s cooldown machinery
    * paces the host. A stream-static left join is executed per
    * micro-batch with the static side broadcast while small — scalable
    * to 10^8 hosts exactly like the batch rules join.
    */
  def prepCandidates(spark: SparkSession, raw: DataFrame,
                     rules: DataFrame): Dataset[Candidate] = {
    import spark.implicits._
    raw
      .join(rules.select(col("host"), col("rules"), col("crawl_delay")),
        Seq("host"), "left")
      .filter(!graft.functions.UrlExpressions.robots_disallowed(
        col("rules"), col("url")))
      .select(col("url"), col("host"), col("isWebnews"),
        col("discSeq").cast("long").as("discSeq"),
        coalesce((col("crawl_delay") * 1000).cast("long"), lit(0L))
          .as("delayMs"))
      .as[Candidate]
  }

  /** Attach the politeness operator to a candidate stream. `minDelayMs`
    * > 0 (global floor) or `hostDelays` (per-host robots Crawl-delay on
    * `Candidate.delayMs`) enables rate limiting via
    * ProcessingTimeTimeout.
    *
    * OPERATIONAL NOTE: once ProcessingTimeTimeout is on, Spark's
    * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is
    * unconditionally true, so the query constructs a micro-batch every
    * trigger even with no input (that is what delivers cooldown
    * wakeups) and never reports `noNewData` —
    * `StreamingQuery.processAllAvailable()` will block indefinitely and
    * `Trigger.ProcessingTime(0)` spins hot. Run cooled queries with a
    * real trigger interval (≈ the smallest host delay) and await
    * progress by sink observation, not processAllAvailable.
    */
  def schedule(spark: SparkSession, candidates: Dataset[Candidate],
               budget: Int, maxPending: Int = 100000,
               maxSeenKeys: Int = 500000,
               minDelayMs: Long = 0L,
               hostDelays: Boolean = false): Dataset[ScheduledFetch] = {
    import spark.implicits._
    val timeout =
      if (minDelayMs > 0 || hostDelays) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    candidates
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        scheduleFn(budget, maxPending, maxSeenKeys, minDelayMs, hostDelays))
  }
}
