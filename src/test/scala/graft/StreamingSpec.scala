package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingFrontier
import graft.streaming.StreamingFrontier.{Candidate, ScheduledFetch}

/** Streaming politeness window: per-micro-batch budget per host, priority
  * order, stateful remainder + seen-set dedup across batches.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flatMapGroupsWithState politeness: budget, priority, state carryover, dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Candidate]
    val scheduled = StreamingFrontier.schedule(spark, input.toDS(), budget = 3)
    val q = scheduled.writeStream
      .outputMode("append").format("memory").queryName("sched")
      .trigger(Trigger.ProcessingTime(0)).start()

    def emitted(): Seq[ScheduledFetch] =
      spark.table("sched").as[ScheduledFetch].collect().toSeq

    // batch 1: 5 candidates for hostA (2 news), 1 for hostB
    input.addData(
      Candidate("a/u1", "hostA", isWebnews = false, 1),
      Candidate("a/u2", "hostA", isWebnews = true, 2),
      Candidate("a/u3", "hostA", isWebnews = false, 3),
      Candidate("a/u4", "hostA", isWebnews = true, 4),
      Candidate("a/u5", "hostA", isWebnews = false, 5),
      Candidate("b/u1", "hostB", isWebnews = false, 1))
    q.processAllAvailable()
    val b1 = emitted()
    val aB1 = b1.filter(_.host == "hostA")
    assert(aB1.length === 3)
    // priority: news first (u2, u4), then FIFO (u1)
    assert(aB1.sortBy(_.rank).map(_.url) === Seq("a/u2", "a/u4", "a/u1"))
    assert(b1.count(_.host == "hostB") === 1)

    // batch 2: duplicates are dropped; remainder (u3, u5) drains first
    input.addData(
      Candidate("a/u1", "hostA", isWebnews = false, 1), // dup of emitted
      Candidate("a/u5", "hostA", isWebnews = false, 5), // dup of pending
      Candidate("a/u6", "hostA", isWebnews = false, 6))
    q.processAllAvailable()
    val aB2 = emitted().filter(_.host == "hostA").filterNot(aB1.contains)
    assert(aB2.sortBy(_.rank).map(_.url) === Seq("a/u3", "a/u5", "a/u6"))
    // ranks are cumulative per host
    assert(aB2.map(_.rank).sorted === Seq(4L, 5L, 6L))
    q.stop()
  }

  test("mega-host state stays bounded: pending and seen-key caps hold") {
    import org.apache.spark.sql.streaming.TestGroupState
    val fn = StreamingFrontier.scheduleFn(budget = 10, maxPending = 1000,
      maxSeenKeys = 2000, minDelayMs = 0L) _
    var state = TestGroupState.create[StreamingFrontier.HostState](
      org.apache.spark.api.java.Optional.empty[StreamingFrontier.HostState](), org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      1000L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    // a mega-host floods 50k candidates across 5 calls
    var emittedTotal = 0
    for (batch <- 0 until 5) {
      val in = (0 until 10000).iterator.map(i =>
        StreamingFrontier.Candidate(s"m/u${batch * 10000 + i}", "mega",
          isWebnews = false, batch * 10000L + i))
      val out = fn("mega", in, state).toList
      emittedTotal += out.length
      val s = state.get
      assert(s.pending.length <= 1000, "pending cap")
      assert(s.seenKeys.size <= 2000, "seen cap")
      state = TestGroupState.create[StreamingFrontier.HostState](
        org.apache.spark.api.java.Optional.of(s), org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        1000L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    }
    assert(emittedTotal === 50) // 5 calls × budget 10
  }

  test("politeness cooldown: in-window input buffers, timeout re-emits") {
    import org.apache.spark.sql.streaming.TestGroupState
    val fn = StreamingFrontier.scheduleFn(budget = 2, maxPending = 100,
      maxSeenKeys = 1000, minDelayMs = 60000L) _
    def st(prev: Option[StreamingFrontier.HostState], nowMs: Long,
           timedOut: Boolean) =
      TestGroupState.create[StreamingFrontier.HostState](
        prev.map(org.apache.spark.api.java.Optional.of[StreamingFrontier.HostState])
          .getOrElse(org.apache.spark.api.java.Optional.empty[StreamingFrontier.HostState]()),
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
        nowMs, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = timedOut)

    // t=0: first batch emits `budget` and arms the cooldown
    val s0 = st(Option.empty, 0L, timedOut = false)
    val cands = (1 to 5).map(i =>
      StreamingFrontier.Candidate(s"h/u$i", "h", isWebnews = false, i.toLong))
    val e0 = fn("h", cands.iterator, s0).toList
    assert(e0.map(_.url) === Seq("h/u1", "h/u2"))
    assert(s0.get.nextFetchTime === 60000L)
    assert(s0.getTimeoutTimestampMs.isPresent) // wakeup armed (backlog)

    // t=30s (inside the window), new input: buffered, nothing emitted
    val s1 = st(Option(s0.get), 30000L, timedOut = false)
    val e1 = fn("h",
      Iterator(StreamingFrontier.Candidate("h/u6", "h", isWebnews = false, 6L)),
      s1).toList
    assert(e1.isEmpty)
    assert(s1.get.pending.map(_.url) === Seq("h/u3", "h/u4", "h/u5", "h/u6"))

    // t=60s: the timeout fires with NO input → next batch emits
    val s2 = st(Option(s1.get), 60000L, timedOut = true)
    val e2 = fn("h", Iterator.empty, s2).toList
    assert(e2.map(_.url) === Seq("h/u3", "h/u4"))
    assert(s2.get.nextFetchTime === 120000L)
  }

  test("streaming robots disallow: prepCandidates drops disallowed urls in-plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the same robots body → encoded rules derivation the batch engine
    // uses; hostB has no robots row at all (left join → allowed)
    val body = "User-agent: *\nDisallow: /private/\nDisallow: /*?sessionid=\n"
    val (enc, delay) = graft.crawl.Robots.rulesFor(body, "graftbot")
    val rules = Seq(("hostA.com", enc, delay))
      .toDF("host", "rules", "crawl_delay")
    val input = MemoryStream[(String, String, Boolean, Long)]
    val raw = input.toDS().toDF("url", "host", "isWebnews", "discSeq")
    val prepped = StreamingFrontier.prepCandidates(spark, raw, rules)
    val scheduled = StreamingFrontier.schedule(spark, prepped, budget = 10)
    val q = scheduled.writeStream
      .outputMode("append").format("memory").queryName("robots_sched")
      .trigger(Trigger.ProcessingTime(0)).start()
    input.addData(
      ("https://hostA.com/ok.html", "hostA.com", false, 1L),
      ("https://hostA.com/private/x.html", "hostA.com", false, 2L),
      ("https://hostA.com/cart?sessionid=9", "hostA.com", false, 3L),
      ("https://hostB.com/anything", "hostB.com", false, 1L))
    q.processAllAvailable()
    val got = spark.table("robots_sched").as[ScheduledFetch].collect().toSeq
    // a disallowed candidate (path rule AND query-targeting wildcard
    // rule) is never scheduled; allowed + robots-less hosts pass
    assert(got.map(_.url).toSet ===
      Set("https://hostA.com/ok.html", "https://hostB.com/anything"))
    q.stop()
    // Crawl-delay plumbing: the host's delay rides as delayMs (ms) on
    // the prepared candidate — checked on a batch frame, same plan
    val rules2 = Seq(("hostA.com", enc, 2.5)).toDF("host", "rules", "crawl_delay")
    val batch = Seq(("https://hostA.com/ok.html", "hostA.com", false, 1L))
      .toDF("url", "host", "isWebnews", "discSeq")
    val c = StreamingFrontier.prepCandidates(spark, batch, rules2).collect()
    assert(c.length === 1 && c.head.delayMs === 2500L)
  }

  test("live hostDelays query: delayed host paces, zero-delay backlog drains") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Candidate]
    // slow host carries a 600ms robots Crawl-delay on every candidate;
    // fast host has none but a backlog (budget 2/call, 6 candidates)
    input.addData(
      ((1 to 6).map(i => Candidate(s"s/u$i", "slowH", isWebnews = false,
        i.toLong, delayMs = 600L)) ++
       (1 to 6).map(i => Candidate(s"f/u$i", "fastH", isWebnews = false,
        i.toLong))): _*)
    val scheduled = StreamingFrontier.schedule(spark, input.toDS(),
      budget = 2, minDelayMs = 0L, hostDelays = true)
    val q = scheduled.writeStream
      .outputMode("append").format("memory").queryName("delayed")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // NOTE: do NOT call processAllAvailable() here. With
      // ProcessingTimeTimeout, FlatMapGroupsWithStateExec
      // .shouldRunAnotherBatch is unconditionally true, so the query
      // constructs a batch every trigger forever and never reports
      // noNewData — processAllAvailable() would block indefinitely.
      // Poll the sink against a deadline instead.
      def got: Seq[ScheduledFetch] =
        spark.table("delayed").as[ScheduledFetch].collect().toSeq
      // liveness with NO further input: the zero-delay host's backlog
      // drains via next-batch wakeups; the delayed host drains through
      // its cooldown timeouts (≥ 2 windows × 600ms)
      val deadline = System.currentTimeMillis() + 60000
      while (got.length < 12 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val all = got
      assert(all.count(_.host == "fastH") === 6, "fast backlog drained")
      assert(all.count(_.host == "slowH") === 6, "delayed host drained")
      // cumulative per-host ranks dense from 1, priority (discSeq) order
      assert(all.filter(_.host == "slowH").sortBy(_.rank).map(_.url) ===
        (1 to 6).map(i => s"s/u$i"))
      assert(all.filter(_.host == "fastH").sortBy(_.rank).map(_.url) ===
        (1 to 6).map(i => s"f/u$i"))
      assert(all.filter(_.host == "slowH").map(_.rank).sorted ===
        (1L to 6L))
    } finally q.stop()
  }

  test("per-host robots Crawl-delay on the candidate sets the cooldown") {
    import org.apache.spark.sql.streaming.TestGroupState
    // no global floor; delays ride on the candidates (hostDelays = true)
    val fn = StreamingFrontier.scheduleFn(budget = 2, maxPending = 100,
      maxSeenKeys = 1000, minDelayMs = 0L, hostDelays = true) _
    def st(prev: Option[StreamingFrontier.HostState], nowMs: Long,
           timedOut: Boolean) =
      TestGroupState.create[StreamingFrontier.HostState](
        prev.map(org.apache.spark.api.java.Optional.of[StreamingFrontier.HostState])
          .getOrElse(org.apache.spark.api.java.Optional.empty[StreamingFrontier.HostState]()),
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
        nowMs, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)

    // delayed host: Crawl-delay 30s rides on each candidate
    val sD = st(Option.empty, 0L, timedOut = false)
    val dCands = (1 to 4).map(i => StreamingFrontier.Candidate(
      s"d/u$i", "slow", isWebnews = false, i.toLong, delayMs = 30000L))
    val eD = fn("slow", dCands.iterator, sD).toList
    assert(eD.length === 2)
    assert(sD.get.nextFetchTime === 30000L) // the host's own delay
    assert(sD.getTimeoutTimestampMs.isPresent)
    // inside the window: buffered
    val sD1 = st(Option(sD.get), 10000L, timedOut = false)
    assert(fn("slow", Iterator(StreamingFrontier.Candidate(
      "d/u5", "slow", isWebnews = false, 5L, delayMs = 30000L)), sD1).isEmpty)
    // an undelayed host emits every call with no cooldown armed
    val sF = st(Option.empty, 0L, timedOut = false)
    val fCands = (1 to 4).map(i => StreamingFrontier.Candidate(
      s"f/u$i", "fast", isWebnews = false, i.toLong))
    assert(fn("fast", fCands.iterator, sF).toList.length === 2)
    assert(sF.get.nextFetchTime === 0L)
    // backlog liveness: even with no host delay, the wakeup is armed so
    // the pending queue drains without waiting for new input
    assert(sF.getTimeoutTimestampMs.isPresent)
    val sF1 = st(Option(sF.get), 1L, timedOut = false)
    assert(fn("fast", Iterator.empty, sF1).toList.length === 2)
  }
}
