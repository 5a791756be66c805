package graft
package crawl

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim, Row}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Sharded URL-seen Bloom filter: one filter per
  * `floorMod(murmur3(urlKey), shards)` shard, built and probed
  * EXECUTOR-side, persisted beside the frontier snapshots — no
  * driver-held global filter.
  *
  * SHARD↔PARTITION ALIGNMENT (VERDICT r3 #4): the shard function is the
  * same Murmur3(seed 42) hash Spark's `HashPartitioning` applies to a
  * Long key, so whenever the probed stream is hash-partitioned on
  * `urlKey` into a MULTIPLE of `shards` partitions, every task's keys
  * fall into exactly ONE shard (partition p ≡ hash mod N ⇒ shard =
  * p mod S when S | N) — one filter file per task, like an
  * Iceberg-bucket-aligned layout. CrawlJob keys its candidate-dedup
  * exchange accordingly; the LRU cache below remains the fallback for
  * unaligned callers.
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
  * Durability: every shard file is created (empty) at store creation, so
  * an ABSENT shard file is always damage, never "no keys yet". `ensure`
  * rebuilds a damaged set from the committed keys log; if a file goes
  * missing at probe time the expression returns TRUE (suspect), which
  * degrades that shard to the exact anti-join — the safe direction —
  * instead of silently re-admitting seen URLs (ADVICE r2).
  *
  * Probing is a NATIVE Catalyst expression ([[BloomProbeExpr]]): the
  * generated Java calls the static [[ShardedBloom.mightContain]] directly,
  * so the candidate stream stays inside whole-stage codegen (the r2
  * per-row Scala UDF broke the codegen span and paid an encoder
  * round-trip per candidate). Filters load lazily per (dir, shard) into a
  * JVM-wide LRU cache keyed by `version` (the wave id). With
  * urlKey-partitioned candidates an executor may touch all shards (the
  * LRU cap bounds memory); with storage-partitioned (bucketed) candidates
  * each task touches exactly its own shard.
  */
class ShardedBloom(val dir: String, val shards: Int,
                   val expectedPerShard: Long, val fpp: Double)
    extends Serializable {

  /** Merge `keys` (col `urlKey`) into the persisted shard filters.
    * Runs as one Spark job: repartition by shard, then each task
    * read-merge-writes the filters for the shards it holds. Idempotent
    * under task retry (Bloom insertion is idempotent; file replace is an
    * atomic rename). This job is also the cache-materializer of `keys`'
    * lineage when the caller persists it (CrawlJob leans on that to fuse
    * the "pin the newEntries cache" action with the Bloom update).
    */
  /** @param seedVersion when ≥ 0, the merge task also installs the
    *   freshly merged filter into this executor's probe cache under that
    *   version (the version the NEXT wave probes with) — in local mode
    *   and on whichever cluster executor ran the merge, the next wave's
    *   probes then skip the per-wave file reload entirely (measured:
    *   every wave re-read every shard file, a fixed multi-second tax on
    *   the candidate stream). Executors that did not merge a shard load
    *   it from the file once, as before.
    */
  def update(keys: DataFrame, seedVersion: Long = -1L): Unit = {
    val (d, n, eps, f) = (dir, shards, expectedPerShard, fpp)
    // hash() = Murmur3(seed 42), bit-equal to ShardedBloom.shardOf and
    // to HashPartitioning's partitioner (see class doc)
    keys.select(pmod(hash(col("urlKey")), lit(n)).cast("int").as("shard"),
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
          val merged = ShardedBloom.mergeToFile(d, s, eps, f, ks)
          if (seedVersion >= 0) ShardedBloom.seed(d, s, seedVersion, merged)
        }
      }
  }

  /** Probe column: native codegen'd expression (see class doc). */
  def probe(version: Long): Column => Column = { keyCol =>
    GraftColumnShim.column(BloomProbeExpr(
      GraftColumnShim.expression(keyCol), dir, shards, version))
  }
}

/** `mightContain(urlKey)` as a whole-stage-codegen expression: the
  * generated code is one static call — no UDF closure, no encoder.
  */
case class BloomProbeExpr(child: Expression, dir: String, shards: Int,
                          version: Long) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShardedBloom.mightContain(dir, shards, version, v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dirRef = ctx.addReferenceObj("bloomDir", dir, "java.lang.String")
    // version (the wave id) goes through `references`, not the code text:
    // inlining it would regenerate byte-different Java every wave and
    // force a Janino recompile of the whole anti-join stage (see
    // [[graft.functions.StableConst]])
    val verRef = ctx.addReferenceObj("bloomVersion", Long.box(version),
      "java.lang.Long")
    defineCodeGen(ctx, ev, c =>
      s"graft.crawl.ShardedBloom.mightContain($dirRef, $shards, (long) $verRef, $c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomProbeExpr =
    copy(child = c)
}

object ShardedBloom {

  private def metaPath(dir: String) = Paths.get(s"$dir/meta.json")
  private def shardPath(dir: String, s: Int) = Paths.get(f"$dir/shard_$s%04d.bf")

  /** Open the filter set at `dir`, creating it (geometry from the args +
    * a bulk build over `allKeys`) if absent. Every shard file is created
    * at build time, so a later absent file is detectably damage; a
    * damaged set (meta present, any shard file missing) is rebuilt from
    * the keys log here. On clean resume the persisted files already hold
    * every committed key (superset-safe).
    */
  def ensure(dir: String, shards: Int, expectedTotal: Long, fpp: Double,
             allKeys: => DataFrame): ShardedBloom = {
    if (Files.exists(metaPath(dir))) {
      val m = Files.readString(metaPath(dir))
      def field(k: String): String =
        s""""$k"\\s*:\\s*([0-9.eE+-]+)""".r.findFirstMatchIn(m).get.group(1)
      val sb = new ShardedBloom(dir, field("shards").toInt,
        field("expectedPerShard").toLong, field("fpp").toDouble)
      if ((0 until sb.shards).exists(s => !Files.exists(shardPath(dir, s)))) {
        // damaged: rebuild the whole set from the committed keys log
        (0 until sb.shards).foreach(s => Files.deleteIfExists(shardPath(dir, s)))
        (0 until sb.shards).foreach(s =>
          mergeToFile(dir, s, sb.expectedPerShard, sb.fpp, Nil))
        sb.update(allKeys)
      }
      sb
    } else {
      Files.createDirectories(Paths.get(dir))
      val eps = math.max(expectedTotal / math.max(shards, 1), 1000L)
      val sb = new ShardedBloom(dir, shards, eps, fpp)
      // every shard file exists from day one (see class doc: absence
      // must mean damage, not "shard never touched")
      (0 until shards).foreach(s => mergeToFile(dir, s, eps, fpp, Nil))
      sb.update(allKeys)
      Files.writeString(metaPath(dir),
        s"""{"shards": $shards, "expectedPerShard": $eps, "fpp": $fpp}""")
      sb
    }
  }

  /** Executor-side read-merge-write of one shard file (atomic replace);
    * returns the merged filter so the caller may seed the probe cache.
    */
  private[crawl] def mergeToFile(dir: String, shard: Int, eps: Long,
                                 fpp: Double, keys: Iterable[Long]): BloomFilter = {
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
    bf
  }

  /** Install a just-merged filter under the version the next wave will
    * probe with (see [[ShardedBloom.update]]).
    */
  private[crawl] def seed(dir: String, shard: Int, version: Long,
                          bf: BloomFilter): Unit = {
    cache.put(s"$dir#$shard", new Entry(version, bf))
    if (cache.size() > maxCached) evictOldest()
  }

  /** JVM-wide probe cache: (dir#shard) → (version, filter|null). Reads
    * are LOCK-FREE (ConcurrentHashMap.get — a per-row synchronized LRU
    * would serialize all executor threads, the r1 classloader-lock
    * failure mode all over again). Approximate LRU: entries carry a
    * millisecond-granularity access stamp (written only when it changes,
    * so no per-row cache-line ping-pong); when an insert pushes the map
    * past [[maxCached]] the least-recently-stamped entry is evicted —
    * never the whole cache (the r2 clear-all dumped every executor's
    * working set on overflow).
    */
  private val maxCached = 256
  private final class Entry(val version: Long, val filter: BloomFilter) {
    @volatile var access: Long = System.nanoTime() >> 20 // ~ms ticks
  }
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Shard of a urlKey: Murmur3(seed 42) — Spark's `hash()` /
    * `HashPartitioning` hash for a Long — mod shard count, so shard
    * assignment nests under any urlKey hash-partitioning whose
    * partition count is a multiple of `shards` (class doc).
    */
  def shardOf(key: Long, shards: Int): Int =
    java.lang.Math.floorMod(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(key, 42), shards)

  /** Static probe target of [[BloomProbeExpr]]'s generated code. A
    * missing shard file yields TRUE — "suspect", resolved by the exact
    * anti-join — because after [[ensure]] every shard file exists, so
    * absence means external damage (ADVICE r2: never silently re-admit).
    */
  def mightContain(dir: String, shards: Int, version: Long,
                   key: Long): Boolean = {
    val shard = shardOf(key, shards)
    val ck = s"$dir#$shard"
    var e = cache.get(ck)
    if (e == null || e.version != version) {
      val p = shardPath(dir, shard)
      val bf =
        if (Files.exists(p)) {
          val in = new BufferedInputStream(Files.newInputStream(p))
          try BloomFilter.readFrom(in) finally in.close()
        } else null
      e = new Entry(version, bf)
      cache.put(ck, e)
      if (cache.size() > maxCached) evictOldest()
    } else {
      val now = System.nanoTime() >> 20
      if (e.access != now) e.access = now // write only on tick change
    }
    e.filter == null || e.filter.mightContainLong(key)
  }

  private def evictOldest(): Unit = cache.synchronized {
    while (cache.size() > maxCached) {
      var oldestK: String = null
      var oldestA = Long.MaxValue
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        if (en.getValue.access < oldestA) {
          oldestA = en.getValue.access; oldestK = en.getKey
        }
      }
      if (oldestK == null) return
      cache.remove(oldestK)
    }
  }
}
