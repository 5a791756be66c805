package graft
package crawl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped snapshot store over partitioned Parquet (SURVEY.md §7.0:
  * no Iceberg runtime jar in this sandbox — this trait-level contract is
  * what a real Iceberg catalog would drop into).
  *
  * Layout:
  * {{{
  *   root/wave_00007/state/      frontier snapshot (parquet)
  *   root/wave_00007/articles/   articles extracted IN wave 7 (parquet)
  *   root/wave_00007/manifest.json  metrics + per-partition lineage
  *   root/_LATEST                committed wave id (atomic rename commit)
  * }}}
  *
  * Commit protocol: data dirs are written first, the manifest second, and
  * `_LATEST` is atomically renamed into place last — a crashed wave leaves
  * `_LATEST` pointing at the previous complete snapshot, so resume is
  * always from a consistent wave (ST4 checkpointing; the reference's
  * equivalent durability is SQLite WAL commits, datacollector.py:226-252).
  */
class FrontierStore(val root: String) {

  private def waveDir(w: Int): String = f"$root/wave_$w%05d"

  def statePath(w: Int): String = s"${waveDir(w)}/state"
  def articlesPath(w: Int): String = s"${waveDir(w)}/articles"

  def commitWave(spark: SparkSession, wave: Int, state: DataFrame,
                 articles: Option[DataFrame], metrics: WaveMetrics,
                 withLineage: Boolean = true): Unit = {
    // sequential writes: concurrent jobs over the same cached wave
    // intermediates were measured to double peak memory pressure and
    // trigger GC stalls at local[32] — the overlap saving (~1s/wave) is
    // not worth the variance
    state.write.mode(SaveMode.Overwrite).parquet(statePath(wave))
    articles.foreach(_.write.mode(SaveMode.Overwrite).parquet(articlesPath(wave)))

    // per-partition lineage: row count per urlKey shard of the committed
    // snapshot (re-read, so the manifest describes the bytes on disk)
    val lineage = if (!withLineage) "{}" else spark.read.parquet(statePath(wave))
      .groupBy(pmod(col("urlKey"), lit(16)).as("shard"))
      .agg(count(lit(1)).as("rows"))
      .collect().map(r => s""""${r.getLong(0)}": ${r.getLong(1)}""")
      .sorted.mkString("{", ", ", "}")
    val m = metrics
    val manifest =
      s"""{"wave": ${m.wave}, "scheduled": ${m.scheduled}, "fetched": ${m.fetched},
         | "failed_final": ${m.failedFinal}, "retried": ${m.retried},
         | "new_links": ${m.newLinks}, "dup_links": ${m.dupLinks},
         | "disallowed": ${m.disallowed}, "pending_after": ${m.pendingAfter},
         | "state_path": "${statePath(wave)}",
         | "lineage_rows_per_shard": $lineage}""".stripMargin
    Files.createDirectories(Paths.get(waveDir(wave)))
    Files.writeString(Paths.get(s"${waveDir(wave)}/manifest.json"), manifest)

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

  def readState(spark: SparkSession, wave: Int): DataFrame =
    spark.read.parquet(statePath(wave))

  /** Maintenance (entry point C, /root/reference/script1.py:11-19 VACUUM
    * analogue): drop state snapshots older than the latest `keepLast`
    * waves. Article outputs are an append log and are always kept; the
    * `_LATEST` pointer is untouched, so resume semantics survive.
    */
  def expireSnapshots(keepLast: Int): Int = {
    val latest = latestWave().getOrElse(return 0)
    var removed = 0
    for (w <- 0 to latest - keepLast) {
      val p = Paths.get(statePath(w))
      if (Files.exists(p)) {
        deleteRecursively(p)
        removed += 1
      }
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
    val dirs = (0 to wave).map(articlesPath).filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }
}
