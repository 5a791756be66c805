package graft
package crawl

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Sharded URL-seen Bloom filter: one filter per `pmod(urlKey, shards)`
  * shard, built and probed EXECUTOR-side, persisted beside the frontier
  * snapshots — no driver-held global filter.
  *
  * Why sharded (SURVEY.md §7.4): at the north rule's 10^10-URL seen set a
  * single filter at ~10 bits/key is ~12.5 GB — unbuildable on the driver
  * and unbroadcastable. Sharding by key makes each piece independently
  * buildable (a `repartition(shard)` + per-partition merge-and-write job,
  * O(new keys) per wave), independently loadable at probe time, and
  * alignable with an Iceberg bucket layout (shard = bucket) so a cluster
  * probe task touches exactly one filter file.
  *
  * Probe semantics: `mightContain == false` is authoritative (the update
  * job for wave N-1 commits BEFORE wave N's `_LATEST`, so filters are
  * always a SUPERSET of committed keys — a crash can only add extra keys,
  * i.e. false positives); `true` is a suspicion resolved by the exact
  * anti-join backstop in [[SeenSet.filterNew]]. FPR therefore affects
  * shuffle volume only, never correctness — mirroring the reference's
  * exact `pages.url UNIQUE` constraint
  * (/root/reference/storage_tools/_datacollector_statements.py:13).
  *
  * Executor caching: filters load lazily per (dir, shard) into a
  * JVM-wide bounded cache, invalidated by `version` (the wave id). With
  * urlKey-partitioned candidates an executor may touch all shards (cache
  * cap bounds memory); with storage-partitioned (bucketed) candidates
  * each task touches exactly its own shard.
  */
class ShardedBloom(val dir: String, val shards: Int,
                   val expectedPerShard: Long, val fpp: Double)
    extends Serializable {

  /** Merge `keys` (col `urlKey`) into the persisted shard filters.
    * Runs as one Spark job: repartition by shard, then each task
    * read-merge-writes the filters for the shards it holds. Idempotent
    * under task retry (Bloom insertion is idempotent; file replace is an
    * atomic rename).
    */
  def update(keys: DataFrame): Unit = {
    val (d, n, eps, f) = (dir, shards, expectedPerShard, fpp)
    keys.select(pmod(col("urlKey"), lit(n)).cast("int").as("shard"),
        col("urlKey"))
      .repartition(n, col("shard"))
      .foreachPartition { it: Iterator[Row] =>
        val byShard = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
        it.foreach { r =>
          byShard.getOrElseUpdate(r.getInt(0),
            scala.collection.mutable.ArrayBuffer.empty[Long]) += r.getLong(1)
        }
        byShard.foreach { case (s, ks) =>
          ShardedBloom.mergeToFile(d, s, eps, f, ks)
        }
      }
  }

  /** Probe column for candidate filtering: executor-side lazy load of the
    * relevant shard filter; absent shard file ⇒ no keys there ⇒ false.
    * `version` keys the executor cache (pass the current wave id).
    */
  def probe(version: Long): Column => Column = { keyCol =>
    val (d, n) = (dir, shards)
    val f = udf((k: Long) => ShardedBloom.mightContain(d, n, version, k))
    f(keyCol)
  }
}

object ShardedBloom {

  private def metaPath(dir: String) = Paths.get(s"$dir/meta.json")
  private def shardPath(dir: String, s: Int) = Paths.get(f"$dir/shard_$s%04d.bf")

  /** Open the filter set at `dir`, creating it (geometry from the args +
    * a bulk build over `allKeys`) if absent. On resume the persisted
    * files already hold every committed key (superset-safe).
    */
  def ensure(dir: String, shards: Int, expectedTotal: Long, fpp: Double,
             allKeys: => DataFrame): ShardedBloom = {
    if (Files.exists(metaPath(dir))) {
      val m = Files.readString(metaPath(dir))
      def field(k: String): String =
        s""""$k"\\s*:\\s*([0-9.eE+-]+)""".r.findFirstMatchIn(m).get.group(1)
      new ShardedBloom(dir, field("shards").toInt,
        field("expectedPerShard").toLong, field("fpp").toDouble)
    } else {
      Files.createDirectories(Paths.get(dir))
      val eps = math.max(expectedTotal / math.max(shards, 1), 1000L)
      val sb = new ShardedBloom(dir, shards, eps, fpp)
      sb.update(allKeys)
      Files.writeString(metaPath(dir),
        s"""{"shards": $shards, "expectedPerShard": $eps, "fpp": $fpp}""")
      sb
    }
  }

  /** Executor-side read-merge-write of one shard file (atomic replace). */
  private[crawl] def mergeToFile(dir: String, shard: Int, eps: Long,
                                 fpp: Double, keys: Iterable[Long]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val p = shardPath(dir, shard)
    val bf =
      if (Files.exists(p)) {
        val in = new BufferedInputStream(Files.newInputStream(p))
        try BloomFilter.readFrom(in) finally in.close()
      } else BloomFilter.create(eps, fpp)
    keys.foreach(bf.putLong)
    val tmp = Paths.get(s"$p.tmp${Thread.currentThread().getId}")
    val out = new BufferedOutputStream(Files.newOutputStream(tmp))
    try bf.writeTo(out) finally out.close()
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** JVM-wide probe cache: (dir#shard) → (version, filter|null). Bounded
    * crudely — full clear past the cap keeps worst-case memory
    * ≤ maxCached filters per executor.
    */
  private val maxCached = 256
  private val cache =
    new ConcurrentHashMap[String, (Long, BloomFilter)]()

  private[crawl] def mightContain(dir: String, shards: Int, version: Long,
                                  key: Long): Boolean = {
    val shard = java.lang.Math.floorMod(key, shards.toLong).toInt
    val ck = s"$dir#$shard"
    var e = cache.get(ck)
    if (e == null || e._1 != version) {
      if (cache.size() > maxCached) cache.clear()
      val p = shardPath(dir, shard)
      val bf =
        if (Files.exists(p)) {
          val in = new BufferedInputStream(Files.newInputStream(p))
          try BloomFilter.readFrom(in) finally in.close()
        } else null
      e = (version, bf)
      cache.put(ck, e)
    }
    e._2 != null && e._2.mightContainLong(key)
  }
}
