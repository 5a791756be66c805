package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, TextExpressions, TextOps}
import graft.operators.{Contamination, Dedup, Multimodal, Similarity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory surface (SURVEY.md §2 analogues over
  * the TPC-H-ish testdata plus the training-data pipeline operators over
  * `documents`/`embeddings`). Every SQL-expressible query has a DuckDB
  * oracle in `oracleSql` with IDENTICAL column names and types; value
  * determinism rules: integer/decimal aggregation only (no raw double
  * sums), ranking on rounded similarities with id tie-breaks, epoch-second
  * integers instead of timestamp columns.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** 2-dp doubles (prices/quantities/discounts) → exact decimal before
    * aggregation: decimal arithmetic is exact and engine-independent,
    * unlike order-dependent double summation.
    */
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** Flagship: the extraction engine over a deterministic synthetic web —
    * url, title, extracted-text length, publish date per news page.
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q24_article_extract")(spark, "/root/testdata/sf0.001")
      .filter($"n_text_chars" > 0)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — grouped aggregation (reference corpus counts, script2.py:23-45)
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          // exact decimal accumulation, double only at the very end (the
          // final rounding is engine-independent; double SUM order is not)
          sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec2($"l_extendedprice")).cast("double").as("sum_price"),
          count(lit(1)).as("n_rows"),
          countDistinct($"l_orderkey").as("n_orders"))
    }),

    // A2/J7 — near-dup corpus filter (script2.py:8-21 semantics)
    "q02_near_dup_filter" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val keep = d.groupBy($"text").agg(count(lit(1)).as("c"))
        .filter($"c" < 4).select($"text")
      d.join(keep, Seq("text"), "left_semi")
        .filter(length($"text") > 200)
        .groupBy($"source").agg(count(lit(1)).as("kept"))
    }),

    // A4/W3 — per-key priority top-k (frontier candidate selection)
    "q03_topk_per_key" -> ((s, dir) => {
      val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id".asc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"user_id", $"event_id", $"rn")
    }),

    // J1 — URL-seen-set membership analogue (left-anti join)
    "q04_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter($"o_totalprice" > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_mktsegment")
    }),

    // J5 + A1 — broadcast dim join + exact decimal revenue
    "q05_join_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy($"p_brand")
        .agg(
          sum(dec2($"l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec2($"l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // SO1/S3 — union + dedup
    "q06_union_dedup" -> ((s, dir) => {
      t(s, dir, "orders").select($"o_custkey".as("key"))
        .unionByName(t(s, dir, "customer").select($"c_custkey".as("key")))
        .distinct()
    }),

    // P11/ST2 — frontier refill: two-tier priority + deterministic limit
    "q07_frontier_refill" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("prio", when($"event_type" === "error", 1).otherwise(0))
        .orderBy($"prio".desc, $"event_id".asc)
        .limit(200)
        .select($"event_id", $"event_type")
    }),

    // Training-data: exact dedup (hash-groupBy, keep lowest id)
    "q08_exact_dedup" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")),

    // Training-data: token counting
    "q09_token_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select($"doc_id",
        TextOps.tokenCount($"text").cast("long").as("n_tokens"),
        length($"text").cast("long").as("n_chars_m"))
    }),

    // Training-data: quality scoring (ratio features)
    "q10_quality_score" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val toks = TextOps.tokens($"text")
      d.select($"doc_id",
        TextOps.alphaRatio($"text").as("alpha_ratio"),
        TextOps.stopwordRatio(toks, Seq("the", "a")).as("stop_ratio"))
    }),

    // Training-data: document fingerprints — Rabin-Karp rolling hash
    // (base 257 mod 2^61-1, oracle-exact via DuckDB HUGEINT list_reduce)
    // + md5 content hash
    "q11_fingerprint" -> ((s, dir) => {
      val rh = udf((x: String) => TextOps.rollingHash(x))
      t(s, dir, "documents").select($"doc_id", rh($"text").as("rh"),
        TextOps.fingerprint($"text").as("text_md5"))
    }),

    // W1/ST analogues — sessionization via window functions
    "q12_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy($"user_id").orderBy($"es".asc, $"event_id".asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("es", unix_timestamp($"ts"))
        .withColumn("brk",
          when(lag($"es", 1).over(w).isNull || $"es" - lag($"es", 1).over(w) > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum($"brk").over(run).cast("long"))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"es").as("start_s"), max($"es").as("end_s"))
    }),

    // Training-data: n-gram Jaccard near-dup pairs (blocked by source)
    "q13_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        "source", shingleSize = 3, threshold = 0.2)),

    // Training-data: exact cosine top-k (brute-force ANN baseline)
    "q14_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        $"vec_id" < 10, k = 5)),

    // Training-data: SimHash near-dup pairs (rows-only; multi-band
    // blocking with recall=1 within maxHamming — OperatorsSpec asserts
    // exact agreement with brute force)
    "q15_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 8)),

    // Training-data: MinHash+LSH near-dup candidates (rows-only)
    "q16_minhash_lsh" -> ((s, dir) =>
      Dedup.minHashLsh(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 16, bands = 8, shingleSize = 2, threshold = 0.2)),

    // Training-data: language-ID heuristic (rows-only; UDF)
    "q17_langid" -> ((s, dir) =>
      t(s, dir, "documents").select($"doc_id",
        GraftFunctions.langId($"text").as("lang_pred"), $"lang")),

    // Multimodal plumbing baseline: byte-level stats over binary payloads
    "q18_binary_stats" -> ((s, dir) =>
      t(s, dir, "documents").select($"doc_id",
        octet_length($"text").cast("long").as("n_bytes"),
        ascii($"text").cast("long").as("first_byte"))),

    // P1-P9 URL algebra over synthesized URL families (truth via CASE oracle)
    "q19_url_algebra" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val base = concat(lit("https://www."), $"source", lit(".example.com"))
      val url = concat(base,
        when(pmod($"doc_id", lit(5)) === 0,
          concat(lit("/politics/2024/05/12/story-"), $"doc_id", lit(".html")))
        .when(pmod($"doc_id", lit(5)) === 1, lit("/about/team.html"))
        .when(pmod($"doc_id", lit(5)) === 2, lit("/tag/item?share=twitter"))
        .when(pmod($"doc_id", lit(5)) === 3,
          lit("/read/breaking_news_market_update_today_analysis"))
        .otherwise(lit("/assets/logo.png")))
      d.select($"doc_id", url.as("url"))
        .withColumn("canon", GraftFunctions.cleanUrl($"url"))
        .withColumn("host", GraftFunctions.principalDomain($"url"))
        .withColumn("ftype", GraftFunctions.filetypeOf($"url"))
        .withColumn("navigable", GraftFunctions.isNavigable($"url"))
        .withColumn("news", GraftFunctions.isNewsUrl($"url"))
    }),

    // Streaming-analog tumbling-window rollup (event-time, hourly)
    "q20_window_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("es", unix_timestamp($"ts"))
        .withColumn("hour_s", ($"es" - pmod($"es", lit(3600))).cast("long"))
        .groupBy($"hour_s", $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec2($"value")).cast("double").as("v_sum"))
    }),

    // Training-data: LSH-bucketed approximate ANN (scale path; rows-only)
    "q21_ann_lsh" -> ((s, dir) =>
      Similarity.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        $"vec_id" < 50, k = 5, dim = 64, bits = 8)
        .select($"qid", $"nid", $"rank")),

    // Multimodal: typed metadata over binary payloads (stubbed decode,
    // real mapPartitions plumbing — operators/Multimodal.scala)
    "q22_media_meta" -> ((s, dir) => {
      val enc = udf((id: Long) => Multimodal.encodeFakeImage(
        8 + (id % 8).toInt, 8 + (id % 5).toInt, id))
      val resize = udf((b: Array[Byte]) => Multimodal.resizeStub(b, 2))
      val payloads = t(s, dir, "documents")
        .select($"doc_id", enc($"doc_id").as("payload"))
      import s.implicits._
      Multimodal.features(payloads, "doc_id", "payload").toDF()
        .join(payloads.select($"doc_id".as("id"),
          octet_length(resize($"payload")).cast("long").as("resized_bytes")), Seq("id"))
        .select($"id", $"format", $"width", $"height",
          $"nFrames".cast("long").as("n_frames"), $"nBytes".as("n_bytes"),
          $"resized_bytes")
    }),

    // Multimodal: byte-histogram entropy over opaque binary payloads
    // (text bytes as the deterministic payload — oracle-exact after
    // rounding; the fake-image decode path is oracle-covered by q22)
    "q23_media_entropy" -> ((s, dir) => {
      val payloads = t(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"))
      Multimodal.features(payloads, "doc_id", "payload").toDF()
        .select($"id", round($"entropy", 9).as("entropy"))
    }),

    // Training-data: embedding-cosine near-dup pairs (rows-only; the
    // embedding-space dedup — LSH blocking + exact cosine verify)
    "q25_embedding_neardup" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", dim = 64, bits = 4, threshold = 0.2)),

    // J3/J4 — page↔resource edge table + resource dim (the reference's
    // har_urls / page_har_url_associated pipeline,
    // datacollector.py:313-356) over synthesized per-doc resource lists
    "q26_resource_edges" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val page = concat(lit("https://www."), $"source",
        lit(".example.com/p/"), $"doc_id")
      val res = array(
        concat(lit("https://cdn.example.net/lib-"), pmod($"doc_id", lit(3)), lit(".js")),
        concat(lit("https://stat.example.org/px-"), pmod($"doc_id", lit(7)), lit(".gif")),
        concat(lit("https://media.example.net/m-"), $"doc_id", lit(".mp4")))
      d.select(page.as("page_url"), explode(res).as("res_url"))
        .dropDuplicates("page_url", "res_url")
        .groupBy($"res_url")
        .agg(count(lit(1)).as("n_pages"), min($"page_url").as("first_page"))
    }),

    // J6 — Adblock-rule classification (ads_extractor.py:6-32) with a
    // literal rule set over synthesized resource URLs; broadcast
    // compiled rules, map-side classify
    "q27_ad_rules" -> ((s, dir) => {
      val rules = graft.operators.AdRules(Seq(
        "! test rules",
        "||ads.example.com^",
        "/banner/",
        "@@||ads.example.com/ok/",
        "*track*"))
      val d = t(s, dir, "documents")
      val url = when(pmod($"doc_id", lit(5)) === 0,
          concat(lit("https://ads.example.com/img/a-"), $"doc_id", lit(".gif")))
        .when(pmod($"doc_id", lit(5)) === 1,
          concat(lit("https://cdn.example.net/banner/b-"), $"doc_id", lit(".js")))
        .when(pmod($"doc_id", lit(5)) === 2,
          concat(lit("https://ads.example.com/ok/c-"), $"doc_id", lit(".js")))
        .when(pmod($"doc_id", lit(5)) === 3,
          concat(lit("https://static.example.org/t/track-"), $"doc_id", lit(".js")))
        .otherwise(
          concat(lit("https://static.example.org/app-"), $"doc_id", lit(".css")))
      graft.operators.Resources.classifyResources(
        d.select($"doc_id", url.as("res_url")), "res_url", rules)
    }),

    // S9/A5 — WHOIS record fold (min/max over registry date lists,
    // first-of-list scalars — whoisinfo.py:39-112) over deterministic
    // fixture records; external service out of scope
    "q28_whois_fold" -> ((s, dir) => {
      val d = t(s, dir, "documents").select($"source").distinct()
      val a = ascii(substring($"source", 1, 1)).cast("long")
      val l = length($"source").cast("long")
      val e0 = lit(1000000000L)
      val records = d.select(
        concat($"source", lit(".example.com")).as("domain"),
        array(timestamp_seconds(e0 + a * 86400),
          timestamp_seconds(e0 + l * 3600)).as("creation_dates"),
        array(timestamp_seconds(e0 + a * 172800),
          timestamp_seconds(e0 + l * 7200)).as("updated_dates"),
        array(timestamp_seconds(e0 + a * 259200),
          timestamp_seconds(e0 + l * 10800)).as("expiration_dates"),
        array(element_at(array(lit("IT"), lit("US"), lit("FR")),
          (pmod(l, lit(3)) + 1).cast("int"))).as("countries"),
        array(lit("NA")).as("states"),
        array(lit("ok"), lit("reg")).as("statuses"))
      graft.operators.Whois.fold(records)
        .select($"domain",
          unix_timestamp($"creation_date").as("created_s"),
          unix_timestamp($"updated_date").as("updated_s"),
          unix_timestamp($"expiration_date").as("expires_s"),
          $"country", $"state", $"status")
    }),

    // Real-image metadata probe (javax.imageio header read) over MIXED
    // payloads: even doc_ids carry a genuine JDK-encoded PNG, odd ones
    // the synthetic GIMG layout — the oracle pins the encode→probe
    // round trip (a misread IHDR would shift every even width/height)
    "q29_image_probe" -> ((s, dir) => {
      val enc = udf((id: Long) =>
        if (id % 2 == 0)
          Multimodal.encodeRealPng(4 + (id % 9).toInt, 3 + (id % 7).toInt, id)
        else
          Multimodal.encodeFakeImage(8 + (id % 8).toInt, 8 + (id % 5).toInt, id))
      val payloads = t(s, dir, "documents")
        .select($"doc_id", enc($"doc_id").as("payload"))
      Multimodal.features(payloads, "doc_id", "payload").toDF()
        .select($"id", $"format", $"width", $"height",
          $"nFrames".cast("long").as("n_frames"))
    }),

    // Real A/V container headers (pure-JVM WAV RIFF + MP4 moov/mvhd/tkhd
    // parses — operators/Multimodal.scala): even doc_ids carry a genuine
    // RIFF/WAVE byte stream, odd ones a minimal real MP4 box tree; the
    // oracle pins the byte-level encode→parse round trip (a misread
    // chunk offset shifts every value)
    "q30_av_probe" -> ((s, dir) => {
      val enc = udf((id: Long) =>
        if (id % 2 == 0)
          Multimodal.encodeWav(8000 + (id % 4).toInt * 4000,
            1 + (id % 2).toInt, 100 + (id % 50).toInt, id)
        else
          Multimodal.encodeTinyMp4(320 + (id % 16).toInt, 240 + (id % 9).toInt,
            1000 + (id % 977).toInt, 1000))
      val payloads = t(s, dir, "documents")
        .select($"doc_id", enc($"doc_id").as("payload"))
      Multimodal.features(payloads, "doc_id", "payload").toDF()
        .select($"id", $"format",
          $"sampleRate".cast("long").as("sample_rate"),
          $"channels".cast("long").as("n_channels"),
          $"width", $"height",
          $"nFrames".cast("long").as("n_frames"),
          $"durationMs".as("duration_ms"))
    }),

    // Article extraction as a queryable operator over a deterministic
    // synthetic web SIZED BY the scale-factor dir (rows-only;
    // byte-identity is covered by sbt test). lineitem's row count is the
    // dir's sf proxy (it scales linearly with sf in every testdata
    // generation; documents/embeddings have scaled sublinearly).
    "q24_article_extract" -> ((s, dir) => {
      import s.implicits._
      val sfRows = t(s, dir, "lineitem").count()
      val cfg = graft.synth.WebGen.Config(
        nPages = math.max(2000L, sfRows / 10), nHosts = 4)
      s.range(cfg.nPages).mapPartitions { it =>
        it.map { i =>
          val (url, _, html, _, _) = graft.synth.WebGen.rowAt(cfg, i)
          val e = graft.extract.ArticleExtractor.extract(html, url,
            UrlOps.getPrincipalDomain(url), NewsUrl.isNewsUrl(url))
          (url, e.title, if (e.text == null) 0 else e.text.length,
            e.publishDate)
        }
      }.toDF("url", "title", "n_text_chars", "publish_date")
    }),

    // Training-data: IVF approximate ANN (partition-pruned scale path;
    // rows-only — the spherical-k-means quantizer's recall vs brute
    // force is gated in OperatorsSpec)
    "q31_ann_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        $"vec_id" < 50, k = 5, dim = 64, nlist = 16, nProbe = 4)
        .select($"qid", $"nid", $"rank")),

    // Training-data: corpus-level duplicated-segment removal (the
    // CCNet/C4-style cross-document boilerplate-line dedup re-expressed
    // over single-line text: 3-word non-overlapping segments present in
    // ≥2 distinct docs are dropped everywhere, survivors rejoin in order)
    "q32_segment_dedup" -> ((s, dir) =>
      Dedup.duplicateSegments(t(s, dir, "documents"), "doc_id", "text",
        segWords = 3, minDocs = 2)),

    // Training-data: within-document repetition signals (Gopher-style
    // quality rules: top-bigram mass fraction + duplicate-trigram
    // fraction)
    "q33_repetition" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select($"doc_id", TextOps.tokens($"text").as("w"))
        .select($"doc_id",
          TextOps.shingles($"w", 2).as("bg"),
          TextOps.shingles($"w", 3).as("tg"))
      val top = base.select($"doc_id", explode($"bg").as("b"))
        .groupBy($"doc_id", $"b").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("top_c"), sum($"c").as("n_bg"))
      base.select($"doc_id",
          size($"tg").cast("long").as("n_tg"),
          size(array_distinct($"tg")).cast("long").as("n_tg_d"))
        .join(top, Seq("doc_id"), "left")
        .select($"doc_id",
          round(coalesce($"top_c".cast("double") / $"n_bg", lit(0.0)), 9)
            .as("top_bigram_frac"),
          round(when($"n_tg" > 0,
            ($"n_tg" - $"n_tg_d").cast("double") / $"n_tg").otherwise(0.0), 9)
            .as("dup_trigram_frac"))
    }),

    // Training-data: near-dup cluster resolution — connected components
    // (min-label + pointer jumping) over a rare-shingle co-occurrence
    // graph (docs sharing a trigram that occurs in EXACTLY 2 docs);
    // cluster id = component-min doc_id, singletons their own cluster
    "q34_dup_clusters" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val sh = d.select($"doc_id",
        explode(array_distinct(TextOps.shingles(TextOps.tokens($"text"), 3)))
          .as("shingle"))
      val rare = sh.groupBy($"shingle").agg(count(lit(1)).as("nd"))
        .filter($"nd" === 2).select($"shingle")
      val e = sh.join(rare, Seq("shingle"))
      val pairs = e.as("a").join(e.as("b"),
          col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
        .distinct()
      Dedup.connectedComponents(pairs, "src", "dst",
          d.select($"doc_id"), "doc_id")
        .select($"v".as("doc_id"), $"component".as("cluster"))
    }),

    // Training-data: deterministic content-hash sampling (reproducible
    // held-out split selection — the sample is a pure function of the
    // CONTENT, stable across reshards/reorders, unlike rand(); ~1/8 rate
    // via the first md5 hex byte). Map-side only: no shuffle, the
    // predicate rides the scan.
    "q35_hash_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(substring(md5($"text"), 1, 2) < "20")
        .select($"doc_id", $"source")),

    // Training-data: corpus vocabulary statistics — global top-k tokens
    // (two-phase: map-side partial counts, then a take-ordered final;
    // never a single-reducer global sort)
    "q36_top_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextOps.tokens($"text")).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token".asc)
        .limit(20)),

    // Training-data: product-quantization ANN (memory-compression scale
    // path: ADC scan over m-byte codes + exact shortlist re-rank;
    // rows-only — recall vs brute force gated in OperatorsSpec)
    "q37_ann_pq" -> ((s, dir) =>
      Similarity.pqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        $"vec_id" < 50, k = 5, dim = 64, m = 8, ks = 32)
        .select($"qid", $"nid", $"rank")),

    // Training-data: benchmark decontamination (exact 8-gram overlap vs
    // an eval set — src0 plays the benchmark). Gram → md5 map-side, the
    // benchmark digest set broadcast: the corpus never shuffles for the
    // match (operators/Contamination.scala).
    "q38_decontaminate" -> ((s, dir) =>
      Contamination.ngramHits(t(s, dir, "documents"), "doc_id", "text",
        $"source" === "src0", n = 8)),

    // Training-data: stratified deterministic sampling — a fixed quota
    // per stratum (source), ranked by content hash so the pick is a pure
    // function of the data (stable across reshards; domain-mixing
    // weights at training time). One shuffle on the stratum key; no
    // global sort.
    "q39_stratified_sample" -> ((s, dir) => {
      val w = Window.partitionBy($"source")
        .orderBy(md5($"text".cast("binary")), $"doc_id")
      t(s, dir, "documents")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 5)
        .select($"doc_id", $"source", $"rk")
    }),

    // Training-data: text normalization — Unicode NFC (native codegen
    // expression; Spark has no built-in normalizer), control-char strip,
    // whitespace collapse, trim. Pure map-side scan. The appended
    // combining-mark suffix makes the NFC step observable on the ASCII
    // testdata corpus (e+U+0301 → é must compose).
    "q40_normalize" -> ((s, dir) =>
      t(s, dir, "documents").select($"doc_id",
        trim(regexp_replace(regexp_replace(
          TextExpressions.nfc_normalize(
            concat($"text", lit("\u0001 cafe\u0301\u0002  nin\u0303o "))),
          "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
          "  +", " ")).as("norm_text"))),

    // Training-data: composed IVF-PQ ANN (IVFADC -- the production
    // 10^10-vector shape: coarse-quantizer list pruning AND PQ code
    // compression in one index; rows-only -- recall/determinism gated in
    // OperatorsSpec like q31/q37)
    "q41_ann_ivfpq" -> ((s, dir) =>
      Similarity.ivfPqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        $"vec_id" < 50, k = 5, dim = 64, nlist = 16, nProbe = 4,
        m = 8, ks = 32)
        .select($"qid", $"nid", $"rank")),

    // Training-data: one-call corpus dedup -- near-dup pairs -> connected
    // components -> keep exactly one survivor per cluster. The pair stage
    // here is the EXACT blocked n-gram Jaccard (q13's -- SQL-replayable),
    // so the whole pipeline is DuckDB-oracle-exact end to end via a
    // recursive CTE; the scale path (Dedup.dedupCorpus = MinHash+LSH
    // pairs) is fixture-tested in OperatorsSpec.
    "q42_dedup_corpus" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        "source", shingleSize = 3, threshold = 0.2)
      val out = Dedup.dedupCorpusFromPairs(d, "doc_id", pairs)
      pairs.unpersist(blocking = false)
      out
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_near_dup_filter" ->
      """SELECT source, count(*) AS kept
        |FROM documents
        |WHERE length(text) > 200
        |  AND text IN (SELECT text FROM documents GROUP BY text HAVING count(*) < 4)
        |GROUP BY source""".stripMargin,

    "q03_topk_per_key" ->
      """SELECT user_id, event_id, rn FROM (
        |  SELECT user_id, event_id,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,

    "q04_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin,

    "q05_join_agg" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q06_union_dedup" ->
      """SELECT DISTINCT key FROM (
        |  SELECT o_custkey AS key FROM orders
        |  UNION ALL SELECT c_custkey AS key FROM customer)""".stripMargin,

    "q07_frontier_refill" ->
      """SELECT event_id, event_type FROM events
        |ORDER BY (CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) DESC, event_id
        |LIMIT 200""".stripMargin,

    "q08_exact_dedup" ->
      """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS text_md5,
        |  CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q09_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, ' +'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM documents""".stripMargin,

    "q10_quality_score" ->
      """SELECT doc_id,
        |  len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text) AS alpha_ratio,
        |  len(list_filter(list_filter(string_split_regex(text, ' +'), x -> len(x) > 0), x -> (x = 'the' OR x = 'a')))
        |    / len(list_filter(string_split_regex(text, ' +'), x -> len(x) > 0)) AS stop_ratio
        |FROM documents""".stripMargin,

    "q11_fingerprint" ->
      """SELECT doc_id,
        |  CAST(list_reduce(
        |    list_prepend(CAST(0 AS HUGEINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS HUGEINT))),
        |    (h, b) -> (h * 257 + b) % 2305843009213693951) AS BIGINT) AS rh,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS text_md5
        |FROM documents""".stripMargin,

    "q12_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |g AS (
        |  SELECT user_id, event_id, es,
        |    CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |s AS (
        |  SELECT user_id, es,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY es, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(es) AS start_s, max(es) AS end_s
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "q13_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        |  FROM toks WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS cnt
        |  FROM sh a JOIN sh b
        |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, cnt / (sa.sz + sb.sz - cnt) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE cnt / (sa.sz + sb.sz - cnt) >= 0.2""".stripMargin,

    "q14_cosine_topk" ->
      """WITH f AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |    unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM f GROUP BY vec_id),
        |d AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid, sum(a.v * b.v) AS dot
        |  FROM f a JOIN f b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT qid, nid, round(dot / (na.nrm * nb.nrm), 9) AS sim
        |  FROM d JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid),
        |r AS (
        |  SELECT qid, nid,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rank
        |  FROM s)
        |SELECT qid, nid, rank FROM r WHERE rank <= 5""".stripMargin,

    "q17_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','in','is','that','with','for','it'))) AS h_en,
        |    len(list_filter(w, x -> x IN ('el','la','los','las','de','que','y','en','un','una','es'))) AS h_es,
        |    len(list_filter(w, x -> x IN ('le','la','les','des','du','et','que','est','une','dans'))) AS h_fr,
        |    len(list_filter(w, x -> x IN ('der','die','das','und','ist','von','mit','den','ein','nicht'))) AS h_de,
        |    len(list_filter(w, x -> x IN ('il','lo','gli','di','che','e','per','con','del','della'))) AS h_it
        |  FROM toks)
        |SELECT doc_id,
        |  CASE
        |    WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en >= h_it THEN 'en'
        |    WHEN h_es >= h_fr AND h_es >= h_de AND h_es >= h_it THEN 'es'
        |    WHEN h_fr >= h_de AND h_fr >= h_it THEN 'fr'
        |    WHEN h_de >= h_it THEN 'de'
        |    ELSE 'it' END AS lang_pred,
        |  lang
        |FROM hits""".stripMargin,

    "q18_binary_stats" ->
      """SELECT doc_id, strlen(text) AS n_bytes,
        |  CAST(ascii(text) AS BIGINT) AS first_byte
        |FROM documents""".stripMargin,

    "q19_url_algebra" ->
      """WITH u AS (
        |  SELECT doc_id, source, doc_id % 5 AS m,
        |    'https://www.' || source || '.example.com' ||
        |    CASE doc_id % 5
        |      WHEN 0 THEN '/politics/2024/05/12/story-' || doc_id || '.html'
        |      WHEN 1 THEN '/about/team.html'
        |      WHEN 2 THEN '/tag/item?share=twitter'
        |      WHEN 3 THEN '/read/breaking_news_market_update_today_analysis'
        |      ELSE '/assets/logo.png' END AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  CASE WHEN m = 2 THEN 'https://www.' || source || '.example.com/tag/item' ELSE url END AS canon,
        |  source || '.example.com' AS host,
        |  CASE WHEN m IN (0, 1) THEN 'html' WHEN m = 4 THEN 'png' ELSE NULL END AS ftype,
        |  m IN (0, 3) AS navigable,
        |  m IN (0, 3) AS news
        |FROM u""".stripMargin,

    "q20_window_rollup" ->
      """SELECT es - (es % 3600) AS hour_s, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v_sum
        |FROM (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type, value FROM events)
        |GROUP BY 1, 2""".stripMargin,

    "q28_whois_fold" ->
      """SELECT DISTINCT source || '.example.com' AS domain,
        |  CAST(least(1000000000 + ascii(substr(source, 1, 1)) * 86400,
        |             1000000000 + length(source) * 3600) AS BIGINT) AS created_s,
        |  CAST(greatest(1000000000 + ascii(substr(source, 1, 1)) * 172800,
        |                1000000000 + length(source) * 7200) AS BIGINT) AS updated_s,
        |  CAST(greatest(1000000000 + ascii(substr(source, 1, 1)) * 259200,
        |                1000000000 + length(source) * 10800) AS BIGINT) AS expires_s,
        |  (['IT', 'US', 'FR'])[CAST(length(source) % 3 AS INTEGER) + 1] AS country,
        |  'NA' AS state,
        |  'ok' AS status
        |FROM documents""".stripMargin,

    "q26_resource_edges" ->
      """WITH e AS (
        |  SELECT DISTINCT
        |    'https://www.' || source || '.example.com/p/' || doc_id AS page_url,
        |    unnest(['https://cdn.example.net/lib-' || (doc_id % 3) || '.js',
        |            'https://stat.example.org/px-' || (doc_id % 7) || '.gif',
        |            'https://media.example.net/m-' || doc_id || '.mp4']) AS res_url
        |  FROM documents)
        |SELECT res_url, count(*) AS n_pages, min(page_url) AS first_page
        |FROM e GROUP BY res_url""".stripMargin,

    "q27_ad_rules" ->
      """SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'https://ads.example.com/img/a-' || doc_id || '.gif'
        |    WHEN 1 THEN 'https://cdn.example.net/banner/b-' || doc_id || '.js'
        |    WHEN 2 THEN 'https://ads.example.com/ok/c-' || doc_id || '.js'
        |    WHEN 3 THEN 'https://static.example.org/t/track-' || doc_id || '.js'
        |    ELSE 'https://static.example.org/app-' || doc_id || '.css' END AS res_url,
        |  doc_id % 5 IN (0, 1, 3) AS is_advertising
        |FROM documents""".stripMargin,

    "q23_media_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |freq AS (SELECT doc_id, c, count(*) AS n FROM chars GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(n) AS t FROM freq GROUP BY 1)
        |SELECT f.doc_id AS id, round(sum(- (n / t) * log2(n / t)), 9) AS entropy
        |FROM freq f JOIN tot USING (doc_id) GROUP BY f.doc_id""".stripMargin,

    "q22_media_meta" ->
      """SELECT doc_id AS id, 'image' AS format,
        |  CAST(8 + doc_id % 8 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 5 AS INTEGER) AS height,
        |  CAST(1 AS BIGINT) AS n_frames,
        |  CAST(12 + (8 + doc_id % 8) * (8 + doc_id % 5) AS BIGINT) AS n_bytes,
        |  CAST(12 + ((8 + doc_id % 8) // 2) * ((8 + doc_id % 5) // 2) AS BIGINT) AS resized_bytes
        |FROM documents""".stripMargin,

    "q30_av_probe" ->
      """SELECT doc_id AS id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS format,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 + (doc_id % 4) * 4000
        |            ELSE -1 END AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 2
        |            ELSE -1 END AS BIGINT) AS n_channels,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN -1
        |            ELSE 320 + doc_id % 16 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN -1
        |            ELSE 240 + doc_id % 9 END AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 100 + doc_id % 50
        |            ELSE 1 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |            THEN ((100 + doc_id % 50) * 1000) // (8000 + (doc_id % 4) * 4000)
        |            ELSE 1000 + doc_id % 977 END AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    "q29_image_probe" ->
      """SELECT doc_id AS id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'image' END AS format,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 4 + doc_id % 9
        |            ELSE 8 + doc_id % 8 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3 + doc_id % 7
        |            ELSE 8 + doc_id % 5 END AS INTEGER) AS height,
        |  CAST(1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,

    "q32_segment_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS w
        |  FROM documents),
        |seglist AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[]) ELSE
        |      list_transform(range(0, ((len(w) - 1) // 3) + 1),
        |        p -> array_to_string(w[(p*3+1):(p*3+3)], ' ')) END AS segs
        |  FROM toks),
        |seg AS (
        |  SELECT doc_id, unnest(range(0, len(segs))) AS pos, unnest(segs) AS segment
        |  FROM seglist),
        |freq AS (SELECT segment, count(DISTINCT doc_id) AS nd FROM seg GROUP BY segment),
        |agg AS (
        |  SELECT doc_id,
        |    count(*) AS n_segments,
        |    sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_dropped,
        |    coalesce(string_agg(CASE WHEN nd < 2 THEN segment END, ' ' ORDER BY pos), '') AS clean_text
        |  FROM seg JOIN freq USING (segment) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
        |  CAST(coalesce(a.n_segments, 0) AS BIGINT) AS n_segments,
        |  CAST(coalesce(a.n_dropped, 0) AS BIGINT) AS n_dropped
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "q33_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bg,
        |    list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tg
        |  FROM toks),
        |bgr AS (
        |  SELECT doc_id, b, count(*) AS c
        |  FROM (SELECT doc_id, unnest(bg) AS b FROM g) GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg FROM bgr GROUP BY doc_id)
        |SELECT g.doc_id,
        |  round(coalesce(CAST(top.top_c AS DOUBLE) / top.n_bg, 0.0), 9) AS top_bigram_frac,
        |  round(CASE WHEN len(tg) > 0
        |    THEN CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg)
        |    ELSE 0.0 END, 9) AS dup_trigram_frac
        |FROM g LEFT JOIN top USING (doc_id)""".stripMargin,

    "q34_dup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        |  FROM toks WHERE len(w) >= 3),
        |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) = 2),
        |edges AS (
        |  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  WHERE a.shingle IN (SELECT shingle FROM rare)),
        |und AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
        |verts AS (SELECT DISTINCT u AS x FROM und),
        |reach(x, r) AS (
        |  SELECT x, x FROM verts
        |  UNION
        |  SELECT e.v, reach.r FROM reach JOIN und e ON e.u = reach.x),
        |comp AS (SELECT x AS doc_id, min(r) AS cluster FROM reach GROUP BY x)
        |SELECT d.doc_id, CAST(coalesce(c.cluster, d.doc_id) AS BIGINT) AS cluster
        |FROM documents d LEFT JOIN comp c USING (doc_id)""".stripMargin,

    "q35_hash_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(text), 1, 2) < '20'""".stripMargin,

    "q36_top_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(text, ' +'), x -> len(x) > 0)) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "q38_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS ts
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source, md5(array_to_string(ts[i:i+7], ' ')) AS gh
        |  FROM toks, UNNEST(generate_series(1, greatest(len(ts) - 7, 0))) AS t(i)
        |  WHERE len(ts) >= 8),
        |bench AS (SELECT DISTINCT gh FROM grams WHERE source = 'src0'),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_hits
        |  FROM (SELECT DISTINCT doc_id, gh FROM grams WHERE source <> 'src0') g
        |  WHERE gh IN (SELECT gh FROM bench)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.source <> 'src0'""".stripMargin,

    "q39_stratified_sample" ->
      """SELECT doc_id, source, rk FROM (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (
        |           PARTITION BY source ORDER BY md5(text), doc_id) AS INT) AS rk
        |  FROM documents)
        |WHERE rk <= 5""".stripMargin,

    "q40_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(
        |    nfc_normalize(text || chr(1) || ' cafe' || chr(769) || chr(2) ||
        |                  '  nin' || chr(771) || 'o '),
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |    '  +', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,

    "q42_dedup_corpus" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(text, ' +'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        |  FROM toks WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS cnt
        |  FROM sh a JOIN sh b
        |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE cnt / (sa.sz + sb.sz - cnt) >= 0.2),
        |und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        |        UNION SELECT doc_b, doc_a FROM pairs),
        |verts AS (SELECT DISTINCT u AS x FROM und),
        |reach(x, r) AS (
        |  SELECT x, x FROM verts
        |  UNION
        |  SELECT e.v, reach.r FROM reach JOIN und e ON e.u = reach.x),
        |comp AS (SELECT x AS doc_id, min(r) AS clu FROM reach GROUP BY x)
        |SELECT d.doc_id,
        |  CAST(coalesce(c.clu, d.doc_id) AS BIGINT) AS cluster,
        |  (d.doc_id = coalesce(c.clu, d.doc_id)) AS keep
        |FROM documents d LEFT JOIN comp c USING (doc_id)""".stripMargin,
  )
}
