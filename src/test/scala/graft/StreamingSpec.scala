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
}
