package graft
package streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming frontier scheduling: per-host politeness budget as
  * a `groupByKey(host).flatMapGroupsWithState` operator (ST3/W1 in
  * SURVEY.md §2.8; the north rule names exactly this shape).
  *
  * This is the streaming-native counterpart of the batch
  * [[graft.crawl.Scheduler]]: candidates stream in (discovered links),
  * each micro-batch emits at most `budget` URLs per host in the
  * reference's priority order (webnews first, then discovery order —
  * /root/reference/storage_tools/datacollector.py:171-205), and the
  * un-emitted remainder + the host's seen-set persist in group state.
  * Checkpointing the query makes every emitted fetch wave resumable
  * (ST4) — state lives in the Structured Streaming state store.
  *
  * Scale: state is per-host (pending queue + seen keys); hosts partition
  * across executors by groupByKey hash. A mega-host's pending queue is
  * bounded by `maxPending` (overflow is dropped oldest-lowest-priority
  * first) — the backpressure knob that mirrors the reference's bounded
  * in-memory work dict (~200, crawler.py:387).
  */
object StreamingFrontier {

  case class Candidate(url: String, host: String, isWebnews: Boolean,
                       discSeq: Long)
  case class ScheduledFetch(url: String, host: String, rank: Long)
  case class HostState(pending: List[Candidate], seen: Set[String],
                       emitted: Long)

  /** priority: webnews first, then discovery sequence. */
  private def prio(c: Candidate): (Boolean, Long) = (!c.isWebnews, c.discSeq)

  def scheduleFn(budget: Int, maxPending: Int)(
      host: String, in: Iterator[Candidate],
      state: GroupState[HostState]): Iterator[ScheduledFetch] = {
    val cur = state.getOption.getOrElse(HostState(Nil, Set.empty, 0L))
    // seen-set dedup (J1 per host) + merge with pending, priority order
    val fresh = in.toList.filter(c => !cur.seen.contains(c.url))
      .distinctBy(_.url)
    val all = (cur.pending ++ fresh).sortBy(prio)
    val (emit, rest) = all.splitAt(budget)
    val bounded = rest.take(maxPending)
    state.update(HostState(
      bounded,
      cur.seen ++ emit.map(_.url) ++ bounded.map(_.url),
      cur.emitted + emit.length))
    emit.iterator.zipWithIndex.map { case (c, i) =>
      ScheduledFetch(c.url, host, cur.emitted + i + 1)
    }
  }

  /** Attach the politeness operator to a candidate stream. */
  def schedule(spark: SparkSession, candidates: Dataset[Candidate],
               budget: Int, maxPending: Int = 100000): Dataset[ScheduledFetch] = {
    import spark.implicits._
    candidates
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        scheduleFn(budget, maxPending))
  }
}
