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

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
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

  /** Crawl `waves` frontier waves; returns (urlsFetchedExtracted, sec). */
  private def crawlBench(cores: Int, webPath: String, waves: Int,
                         budget: Int): (Long, Double) = {
    val spark = session(cores)
    val store = s"/tmp/graft_bench_store_$cores"
    rmrf(store)
    val cfg = CrawlJob.Config(
      pagesPath = webPath, storeRoot = store,
      seeds = WebGen.seeds(benchWebCfg),
      hostBudget = budget, lean = true)
    val t0 = System.nanoTime()
    val finalWave = CrawlJob.run(spark, cfg, stopAfterWaves = waves)
    val sec = (System.nanoTime() - t0) / 1e9
    val fetched = new FrontierStore(store).readArticles(spark, finalWave)
      .map(_.count()).getOrElse(0L)
    spark.stop()
    (fetched, sec)
  }

  private val benchWebCfg = WebGen.Config(
    nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "600000").toLong,
    nHosts = 64)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val waves = sys.env.getOrElse("SPARK_GRAFT_BENCH_WAVES", "7").toInt
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1000000").toInt

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
    val webPath = "/tmp/graft_bench_web"
    rmrf(webPath)
    WebGen.writeTable(s1, benchWebCfg, webPath)
    s1.stop()

    // full parallelism (4N) first, quarter (N) second: the second run gets
    // the warmer JIT, so the reported efficiency is the conservative side
    val (fetched4, sec4) = crawlBench(cpus, webPath, waves, budget)
    val (fetched1, sec1) = crawlBench(math.max(1, cpus / 4), webPath, waves, budget)

    val thr4 = fetched4 / sec4
    val thr1 = fetched1 / sec1
    val efficiency = (thr4 / thr1) / 4.0

    val qJson = qTimes.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = qTimes.map(_._2).sum + sec4 + sec1
    println(
      f"""{"metric":"headline queries + frontier crawl (urls fetched+extracted/sec, ${cpus / 4} vs $cpus%d cores)","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir","crawl":{"pages":${benchWebCfg.nPages},"waves":$waves,"fetched_4n":$fetched4,"sec_4n":$sec4%.2f,"urls_per_sec_4n":$thr4%.1f,"fetched_n":$fetched1,"sec_n":$sec1%.2f,"urls_per_sec_n":$thr1%.1f,"cores_4n":$cpus,"cores_n":${math.max(1, cpus / 4)},"scaling_efficiency":$efficiency%.3f}}""")
  }
}
