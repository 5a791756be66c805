package graft

import org.apache.spark.sql.SparkSession

import graft.crawl.{CrawlJob, FrontierStore}
import graft.synth.WebGen

/** Driver-run benchmark: headline analytics queries at full parallelism,
  * then the frontier crawl throughput (URLs fetched+extracted/sec) at
  * full (4N) and quarter (N) parallelism on the SAME input — the sandbox
  * substitute for the north rule's N vs 4N executor-cluster scaling run
  * (BASELINE.md). Prints ONE JSON line.
  */
object Bench {

  /** RAM-backed working dir: on a real cluster, shuffle/store I/O
    * bandwidth scales with the node count; on this single box it does
    * not — tmpfs removes the one-disk ceiling so the scaling measurement
    * reflects the engine, not /dev/vda.
    */
  private val workRoot =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_bench"
    else "/tmp/graft_bench"

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$workRoot/spark_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def rmrf(p: String): Unit = {
    val f = new java.io.File(p)
    if (f.isDirectory) f.listFiles.foreach(c => rmrf(c.getPath))
    f.delete()
  }

  /** Pull the web table through the OS page cache so every timed run
    * reads from memory — equal I/O footing for both parallelism levels.
    */
  private def warmRead(spark: SparkSession, webPath: String): Unit = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(webPath)
      .select(max(octet_length(col("html"))), max(octet_length(col("text"))))
      .collect()
  }

  /** JIT the extraction path over a real slice of the bench table: the
    * extractor is hundreds of methods and tiered compilation keeps
    * optimizing for ~10^5 pages — without this the FIRST timed run pays
    * residual compilation the second doesn't.
    */
  private def warmParse(spark: SparkSession, webPath: String): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.read.parquet(webPath)
      .filter(pmod(xxhash64(col("url")), lit(6)) === 0)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .mapPartitions(it => it.map { case (u, html) =>
        graft.crawl.PageParse.parse(html, u, NewsUrl.isNewsUrl(u)).links.size
      })
      .agg(sum("value")).collect()
  }

  private def benchCfg(webPath: String, store: String,
                       webCfg: WebGen.Config, budget: Int): CrawlJob.Config =
    CrawlJob.Config(
      pagesPath = webPath, storeRoot = store,
      seeds = WebGen.seeds(webCfg),
      hostBudget = budget, cachePages = false, lean = true,
      expectedTotalUrls = webCfg.nPages * 3,
      compactEvery = 0) // explicit compact at end-of-ramp instead

  private def copyDir(src: String, dst: String): Unit = {
    import java.nio.file._
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Timed steady-state resume: continue `measureWaves` waves from a
    * copied ramp store. Both parallelism levels start from the IDENTICAL
    * committed state, so they do the same work on the same input — the
    * sandbox substitute for the same job on N vs 4N executor clusters.
    * Returns (urlsFetchedExtracted in the timed waves, sec).
    */
  private def timedResume(cores: Int, webPath: String, store: String,
                          webCfg: WebGen.Config, measureWaves: Int,
                          budget: Int): (Long, Double) = {
    val spark = session(cores)
    val cfg = benchCfg(webPath, store, webCfg, budget)
    val fs = new FrontierStore(store)
    val rampWave = fs.latestWave().get
    warmRead(spark, webPath)
    System.gc() // pay the full STW collection here, not mid-measurement
    val t0 = System.nanoTime()
    val finalWave = CrawlJob.run(spark, cfg, stopAfterWaves = measureWaves)
    val sec = (System.nanoTime() - t0) / 1e9
    val fetched = ((rampWave + 1) to finalWave).map { w =>
      val p = fs.articlesPath(w)
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        spark.read.parquet(p).count()
      else 0L
    }.sum
    spark.stop()
    (fetched, sec)
  }

  /** Bench geometry: 512 near-even hosts + a 5% mega-host (skew probe).
    * The per-host budget makes the measured waves FLAT at
    * ~budget × nHosts pages — large enough that parallel fetch+extract
    * work dominates the per-wave planning floor at both core counts.
    */
  private lazy val cpusEnv = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  private lazy val benchWebCfg = WebGen.Config(
    // size the web to the machine: the quarter-cores run must finish its
    // measured waves in minutes even at small core counts
    nPages = sys.env.get("SPARK_GRAFT_BENCH_PAGES").map(_.toLong)
      .getOrElse(math.max(100000L, 75000L * cpusEnv)),
    nHosts = sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS", "512").toInt,
    megaShare = 0.05)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = cpusEnv
    val waves = sys.env.getOrElse("SPARK_GRAFT_BENCH_WAVES", "8").toInt
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1000").toInt

    val headline = Seq(
      "q01_pricing_summary", "q05_join_agg", "q08_exact_dedup",
      "q12_sessionize", "q13_ngram_jaccard", "q14_cosine_topk",
      "q16_minhash_lsh", "q20_window_rollup")

    // --- analytics queries at full parallelism ---
    val s1 = session(cpus)
    val qTimes = headline.map { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s1, sfDir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }

    // --- synthetic web (generated once, full cores) ---
    val webPath = s"$workRoot/web"
    rmrf(webPath)
    WebGen.writeTable(s1, benchWebCfg, webPath)
    s1.stop()

    // untimed warmup: JIT-compile the whole crawl path once (extractor,
    // joins, codegen) so neither timed run pays first-run compilation
    val warmCfg = WebGen.Config(nPages = 20000, nHosts = 16)
    val warmPath = s"$workRoot/warm_web"
    val warmStore = s"$workRoot/store_warm"
    rmrf(warmPath); rmrf(warmStore)
    val sw = session(cpus)
    WebGen.writeTable(sw, warmCfg, warmPath)
    warmParse(sw, webPath)
    CrawlJob.run(sw, benchCfg(warmPath, warmStore, warmCfg, budget),
      stopAfterWaves = 5)
    sw.stop()

    // shared ramp at full cores: fill the frontier to its flat-wave
    // steady state ONCE, compact, then copy the committed store so both
    // timed runs resume from identical state
    val ramp = math.max(1, waves - 3)
    val rampStore = s"$workRoot/store_ramp"
    rmrf(rampStore)
    val sr = session(cpus)
    warmRead(sr, webPath)
    val rampWave = CrawlJob.run(sr,
      benchCfg(webPath, rampStore, benchWebCfg, budget),
      stopAfterWaves = ramp)
    new FrontierStore(rampStore).compact(sr, rampWave)
    sr.stop()
    val store4 = s"$workRoot/store_4n"; val store1 = s"$workRoot/store_n"
    rmrf(store4); rmrf(store1)
    copyDir(rampStore, store4); copyDir(rampStore, store1)

    val (fetched4, sec4) = timedResume(cpus, webPath, store4,
      benchWebCfg, 3, budget)
    val (fetched1, sec1) = timedResume(math.max(1, cpus / 4), webPath, store1,
      benchWebCfg, 3, budget)

    val thr4 = fetched4 / sec4
    val thr1 = fetched1 / sec1
    val efficiency = (thr4 / thr1) / 4.0

    val qJson = qTimes.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = qTimes.map(_._2).sum + sec4 + sec1
    val json =
      f"""{"metric":"headline queries + frontier crawl (urls fetched+extracted/sec, ${cpus / 4} vs $cpus%d cores)","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir","crawl":{"pages":${benchWebCfg.nPages},"waves":$waves,"fetched_4n":$fetched4,"sec_4n":$sec4%.2f,"urls_per_sec_4n":$thr4%.1f,"fetched_n":$fetched1,"sec_n":$sec1%.2f,"urls_per_sec_n":$thr1%.1f,"cores_4n":$cpus,"cores_n":${math.max(1, cpus / 4)},"scaling_efficiency":$efficiency%.3f}}"""
    // file copy first (survives any stdout mangling by the build tool),
    // then the JSON as the final clean stdout line
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LAST.json"), json + "\n")
    catch { case _: Throwable => () }
    System.out.flush(); System.err.flush()
    println(json)
    System.out.flush()
  }
}
