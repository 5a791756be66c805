package graft
package crawl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StableConst.stableInt

/** Iceberg-shaped DELTA store for the frontier (SURVEY.md §7.0: no Iceberg
  * runtime jar in this sandbox — this is the MERGE-INTO shape a real
  * Iceberg catalog would drop into).
  *
  * The state is split by lifecycle so a wave commit is O(wave), never
  * O(state):
  *   - terminal rows (Fetched/Redirected/Failed/Disallowed) are an
  *     APPEND-ONLY log, one dir per wave — they never change again;
  *   - pending rows (the frontier) are a BASE snapshot plus per-wave
  *     deltas (`pendadd` upserts; removals are implied by a key appearing
  *     in the same wave's outcomes or pendadd), compacted every K waves;
  *   - seen KEYS are an append-only urlKey-only log (the seen-set join
  *     side — 8 bytes/row columnar, Iceberg-bucketed on a cluster).
  *
  * Layout:
  * {{{
  *   root/base_00000/pending/     compacted frontier snapshot (parquet)
  *   root/wave_00007/outcomes/    rows finalized IN wave 7
  *   root/wave_00007/pendadd/     pending upserts from wave 7 (new + retries)
  *   root/wave_00007/keys/        urlKeys first seen in wave 7
  *   root/wave_00007/articles/    articles extracted in wave 7 (append log)
  *   root/wave_00007/manifest.json  metrics + per-partition lineage
  *   root/bloom/shard_*.bf        sharded seen-set Bloom (ShardedBloom)
  *   root/_LATEST                 committed wave id (atomic rename commit)
  * }}}
  *
  * Commit protocol: data dirs first, Bloom update second (filters must be
  * a superset of committed keys — see [[ShardedBloom]]), manifest third,
  * `_LATEST` atomically renamed last. A crashed wave leaves `_LATEST` on
  * the previous complete wave, so resume is always consistent (ST4; the
  * reference's equivalent durability is SQLite WAL commits,
  * /root/reference/storage_tools/datacollector.py:226-252).
  *
  * Within one wave the outcomes and pendadd KEY SETS ARE DISJOINT
  * (CrawlJob guarantees it: a scheduled hit/upgrade is terminal, a
  * scheduled miss retries in pendadd, a new discovery is exactly one of
  * the two) — so "latest wave wins per key" needs no intra-wave
  * tie-break.
  */
class FrontierStore(val root: String) {

  private def waveDir(w: Int): String = f"$root/wave_$w%05d"
  private def baseRoot(w: Int): String = f"$root/base_$w%05d"

  def deltaPath(w: Int): String = s"${waveDir(w)}/delta"
  def outcomesPath(w: Int): String = s"${deltaPath(w)}/_kind=o"
  def pendaddPath(w: Int): String = s"${deltaPath(w)}/_kind=p"
  def keysPath(w: Int): String = s"${deltaPath(w)}/_kind=k"
  def articlesPath(w: Int): String = s"${deltaPath(w)}/_kind=a"
  def basePath(w: Int): String = s"${baseRoot(w)}/pending"
  def bloomDir: String = s"$root/bloom"

  private def exists(p: String): Boolean = Files.exists(Paths.get(p))

  /** Null-padded key rows so the keys append shares the delta schema
    * (they compress to ~nothing in parquet, and the single partitioned
    * write keeps the wave commit at ONE Spark job).
    */
  private def padKeys(keys: DataFrame, like: DataFrame): DataFrame = {
    val schema = like.schema
    keys.select(col("urlKey") +: schema.fields.toIndexedSeq
      .filter(_.name != "urlKey")
      .map(f => lit(null).cast(f.dataType).as(f.name)): _*)
  }

  /** Wave-0 commit: the seed rows become the first pending base and the
    * first keys append (main.py:11-13 seed dedup happened upstream).
    */
  def commitInit(spark: SparkSession, init: DataFrame,
                 metrics: WaveMetrics,
                 preCommit: () => Unit = () => ()): Unit = {
    init.write.mode(SaveMode.Overwrite).parquet(basePath(0))
    padKeys(init.select("urlKey"), init)
      .withColumn("_kind", lit("k"))
      .write.partitionBy("_kind").mode(SaveMode.Overwrite).parquet(deltaPath(0))
    preCommit()
    writeManifest(0, metrics, lineage = "{}")
    markLatest(0)
  }

  /** The wave commit is a SINGLE partitioned write: outcomes ∪ pendadd ∪
    * padded keys ∪ articles, split by `_kind` at the FILE level (no
    * shuffle) — one O(wave) Spark job commits the whole wave. State rows
    * carry null article columns and vice versa; the `_kind` partition
    * dirs slice them back apart at read time.
    */
  def commitWave(spark: SparkSession, wave: Int, outcomes: DataFrame,
                 pendadd: DataFrame, keys: DataFrame,
                 articles: DataFrame, metrics: WaveMetrics,
                 withLineage: Boolean = true,
                 preCommit: () => Unit = () => ()): Unit = {
    val timing = sys.env.contains("GRAFT_TIMING")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      if (timing) System.err.println(
        f"[timing] wave $wave $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    timed("delta") {
      // the union of per-kind branches carries sum-of-branch partitions
      // (~10× the shuffle width) of mostly-tiny outputs; coalescing to
      // the session shuffle width keeps the write at one task per core
      // and ~10× fewer files to commit/list — measured as the largest
      // core-count-invariant slice of the wave (task launch + commit
      // rename are serial costs)
      val width = math.max(1,
        spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      outcomes.withColumn("_kind", lit("o"))
        .unionByName(pendadd.withColumn("_kind", lit("p")))
        .unionByName(padKeys(keys, outcomes).withColumn("_kind", lit("k")))
        .unionByName(articles.withColumn("_kind", lit("a")),
          allowMissingColumns = true)
        .coalesce(width)
        .write.partitionBy("_kind").mode(SaveMode.Overwrite).parquet(deltaPath(wave))
    }
    timed("precommit")(preCommit()) // Bloom update: superset-safe before _LATEST
    // per-partition lineage of THIS wave's delta (re-read from disk so the
    // manifest describes the committed bytes) — O(wave), not O(state)
    val deltaDirs = Seq(outcomesPath(wave), pendaddPath(wave)).filter(exists)
    val lineage = if (!withLineage || deltaDirs.isEmpty) "{}" else
      spark.read.parquet(deltaDirs: _*).select("urlKey")
        .groupBy(pmod(col("urlKey"), lit(16)).as("shard"))
        .agg(count(lit(1)).as("rows"))
        .collect().map(r => s""""${r.getLong(0)}": ${r.getLong(1)}""")
        .sorted.mkString("{", ", ", "}")
    writeManifest(wave, metrics, lineage)
    markLatest(wave)
  }

  private def writeManifest(wave: Int, m: WaveMetrics, lineage: String): Unit = {
    val manifest =
      s"""{"wave": ${m.wave}, "scheduled": ${m.scheduled}, "fetched": ${m.fetched},
         | "failed_final": ${m.failedFinal}, "retried": ${m.retried},
         | "new_links": ${m.newLinks}, "dup_links": ${m.dupLinks},
         | "disallowed": ${m.disallowed}, "pending_after": ${m.pendingAfter},
         | "delta_paths": ["${outcomesPath(wave)}", "${pendaddPath(wave)}"],
         | "lineage_rows_per_shard": $lineage}""".stripMargin
    Files.createDirectories(Paths.get(waveDir(wave)))
    Files.writeString(Paths.get(s"${waveDir(wave)}/manifest.json"), manifest)
  }

  private def markLatest(wave: Int): Unit = {
    val tmp = Paths.get(s"$root/_LATEST.tmp")
    Files.writeString(tmp, wave.toString)
    Files.move(tmp, Paths.get(s"$root/_LATEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Last fully committed wave, if any. */
  def latestWave(): Option[Int] = {
    val p = Paths.get(s"$root/_LATEST")
    if (Files.exists(p)) Some(Files.readString(p).trim.toInt) else None
  }

  // _kind subdirs share the union superset schema; slice back to the
  // per-kind column set on read. Schemas are passed explicitly so no
  // read pays a footer-inference job (deltaSchema is fixed by the
  // commit-write contract above).
  def readOutcomes(spark: SparkSession, w: Int): DataFrame =
    spark.read.schema(FrontierSchema.deltaSchema).parquet(outcomesPath(w))
      .select(FrontierSchema.stateColNames.map(col): _*)
  def readPendadd(spark: SparkSession, w: Int): DataFrame =
    spark.read.schema(FrontierSchema.deltaSchema).parquet(pendaddPath(w))
      .select(FrontierSchema.stateColNames.map(col): _*)

  /** Newest compacted base at or below `wave`. */
  def latestBase(wave: Int): Int =
    (0 to wave).filter(w => exists(basePath(w))).max

  /** The frontier (pending rows, all with attempts < max) as of `wave`:
    * base ⊕ deltas, latest wave wins per key, terminal keys drop out.
    * Cost: one shuffle over O(pending + deltas-since-base) — the
    * compaction cadence bounds the delta count.
    */
  def pendingView(spark: SparkSession, wave: Int): DataFrame = {
    val b = latestBase(wave)
    val base = spark.read.schema(FrontierSchema.stateSchema).parquet(basePath(b))
    if (b == wave) base
    else {
      // wave ids enter via StableConst so the view's generated code is
      // identical wave over wave (codegen-cache hit, no Janino recompile)
      val tagged = base.withColumn("_w", stableInt(b)).withColumn("_term", lit(false)) +:
        ((b + 1) to wave).flatMap { v =>
          (if (exists(outcomesPath(v)))
            Seq(readOutcomes(spark, v).withColumn("_w", stableInt(v))
              .withColumn("_term", lit(true)))
          else Nil) ++
          (if (exists(pendaddPath(v)))
            Seq(readPendadd(spark, v).withColumn("_w", stableInt(v))
              .withColumn("_term", lit(false)))
          else Nil)
        }
      val all = tagged.reduce(_ unionByName _)
      val payloadNames = all.columns.filterNot(c =>
        c == "urlKey" || c == "ckey" || c == "_w")
      all.groupBy(col("urlKey"), col("ckey"))
        .agg(max_by(struct(payloadNames.map(col): _*), col("_w")).as("r"))
        .filter(!col("r._term"))
        .select(col("urlKey") +: col("ckey") +:
          payloadNames.filterNot(_ == "_term").map(c => col(s"r.$c")): _*)
    }
  }

  /** Full state view (frontier ∪ all finalized rows) — the analytics /
    * equivalence-test surface; the reference's whole `pages` table.
    */
  def readState(spark: SparkSession, wave: Int): DataFrame = {
    val terminal = (1 to wave).filter(w => exists(outcomesPath(w)))
      .map(w => readOutcomes(spark, w))
    (pendingView(spark, wave) +: terminal).reduce(_ unionByName _)
  }

  /** All urlKeys ever entered (the seen set), as of `wave`. The explicit
    * single-column schema both skips footer inference and prunes the
    * padded columns at the scan.
    */
  def allKeys(spark: SparkSession, wave: Int): DataFrame = {
    val dirs = (0 to wave).map(keysPath).filter(exists)
    spark.read.schema(FrontierSchema.keySchema).parquet(dirs: _*)
  }

  /** Rewrite the pending view as a new base at `wave` (Iceberg
    * `rewrite_data_files` analogue) — amortized O(pending).
    */
  def compact(spark: SparkSession, wave: Int): Unit =
    compactFrom(pendingView(spark, wave), wave)

  /** Compact from an ALREADY-MATERIALIZED pending DataFrame (the crawl
    * loop's incrementally-maintained view — skips re-deriving it from
    * the delta chain). Caller guarantees `df` equals pendingView(wave).
    */
  def compactFrom(df: DataFrame, wave: Int): Unit = {
    val tmp = s"${baseRoot(wave)}_tmp/pending"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    Files.move(Paths.get(s"${baseRoot(wave)}_tmp"), Paths.get(baseRoot(wave)),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Maintenance (entry point C, /root/reference/script1.py:11-19 VACUUM
    * analogue): drop superseded pending bases and the pendadd deltas the
    * OLDEST RETAINED base already folds in. `keepLast` = how many of the
    * newest bases to retain (min 1 — the newest is always kept); deltas
    * newer than the oldest retained base are kept too, so `pendingView`
    * stays reconstructible at every wave ≥ that base.
    * Outcomes/keys/articles are append logs and always kept; `_LATEST`
    * is untouched, so resume survives.
    */
  def expireSnapshots(keepLast: Int = 1): Int = {
    val latest = latestWave().getOrElse(return 0)
    val bases = (0 to latestBase(latest)).filter(w => exists(basePath(w)))
    val kept = bases.takeRight(math.max(1, keepLast))
    val oldestKept = kept.head
    var removed = 0
    for (w <- bases; if w < oldestKept) {
      deleteRecursively(Paths.get(baseRoot(w))); removed += 1
    }
    for (w <- 1 to oldestKept; if exists(pendaddPath(w))) {
      deleteRecursively(Paths.get(pendaddPath(w))); removed += 1
    }
    removed
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(c => deleteRecursively(c))
    Files.deleteIfExists(p)
  }

  /** All articles up to and including `wave` (append-log union). */
  def readArticles(spark: SparkSession, wave: Int): Option[DataFrame] = {
    val dirs = (0 to wave).map(articlesPath).filter(exists)
    if (dirs.isEmpty) None
    else Some(spark.read.schema(FrontierSchema.deltaSchema).parquet(dirs: _*)
      .select(FrontierSchema.articleColNames.map(col): _*))
  }
}
