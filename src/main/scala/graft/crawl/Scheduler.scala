package graft
package crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.mutable

/** Wave scheduling: per-host politeness budget + priority ordering
  * (A4/W1/W3 in SURVEY.md §2).
  *
  * Priority replicates the reference's candidate selection — webnews
  * first, then discovery FIFO (/root/reference/storage_tools/
  * datacollector.py:171-205, crawler.py:335-347) — as the deterministic
  * total order (isWebnews desc, discWave, parentRank, linkIdx, urlKey).
  *
  * Skew: a naive `row_number() over (partition by host)` sorts a
  * mega-host's ENTIRE pending set in one task. Instead phase 1 runs a
  * bounded per-partition top-B heap (mapPartitions, O(B) memory per host
  * per partition), so the exact phase-2 window only sees
  * ≤ B × numPartitions rows per host — the politeness window is the one
  * place the host key must stay unsalted (SURVEY.md §4), and this keeps
  * it cheap anyway.
  */
object Scheduler {

  /** Narrow scheduling row (state row minus article/bookkeeping payload;
    * `attempts` rides along for the retry fold — P12).
    */
  case class SchedRow(urlKey: Long, ckey: String, url: String, host: String,
                      hostRank: Int, isWebnews: Boolean, discWave: Int,
                      parentRank: Long, linkIdx: Int, attempts: Int)

  /** priority tuple: smaller = schedule first */
  private def prio(r: SchedRow): (Int, Int, Long, Int, Long) =
    (if (r.isWebnews) 0 else 1, r.discWave, r.parentRank, r.linkIdx, r.urlKey)

  private val prioOrd: Ordering[SchedRow] = Ordering.by(prio)

  /** Select this wave's fetch set: exact top-`hostBudget` per host by
    * priority, with `scheduledRank` (1-based rank within host).
    *
    * `hostCaps` (host, hostCap): per-host budget floors from
    * `Crawl-delay` (all caps < hostBudget by construction). Phase 1's
    * bounded heap keeps the GLOBAL budget — a superset of every capped
    * set — so the cap applies as an exact rank filter on the reduced
    * phase-2 rows; the caps table is O(delayed hosts) and
    * auto-broadcasts.
    */
  def selectWave(eligible: DataFrame, hostBudget: Int,
                 hostCaps: Option[DataFrame] = None): DataFrame = {
    val spark = eligible.sparkSession
    import spark.implicits._
    val slim = eligible.select($"urlKey", $"ckey", $"url", $"host",
      $"hostRank", $"isWebnews", $"discWave", $"parentRank", $"linkIdx",
      $"attempts")
      .as[SchedRow]

    // phase 1: per-partition bounded top-B per host (max-heap of the
    // worst-kept candidate; O(hosts-in-partition × B) memory)
    val partial: Dataset[SchedRow] = slim.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[String, mutable.PriorityQueue[SchedRow]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.host, mutable.PriorityQueue.empty(prioOrd))
        if (h.size < hostBudget) h += r
        else if (prioOrd.lt(r, h.head)) { h.dequeue(); h += r }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    // phase 2: exact rank on the reduced set
    val w = Window.partitionBy($"host").orderBy(
      $"isWebnews".desc, $"discWave".asc, $"parentRank".asc,
      $"linkIdx".asc, $"urlKey".asc)
    val ranked = partial.toDF()
      .withColumn("scheduledRank", row_number().over(w).cast("long"))
      .filter($"scheduledRank" <= hostBudget)
    hostCaps match {
      case None => ranked
      case Some(caps) =>
        ranked.join(caps, Seq("host"), "left")
          .filter($"hostCap".isNull || $"scheduledRank" <= $"hostCap")
          .drop("hostCap")
    }
  }
}
