package graft
package operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *    O(|Q|·|N|) dot products through the native primitive-array kernel
  *    [[graft.functions.VectorExpressions]] (whole-stage codegen — HOF
  *    lambdas would run interpreted) and broadcast-joined when |Q| is
  *    small, so the big side streams with zero shuffle.
  *  - [[lshTopK]] — random-hyperplane LSH: b sign-bits bucket the corpus;
  *    queries probe only their own bucket (plus optional multi-probe via
  *    fewer bits). At 100 TB the bucket join shuffles each side once on
  *    the bucket key instead of materializing the cross product.
  */
object Similarity {

  /** embedding (array<float|double>) → array<double> plus L2 norm. */
  def withNorm(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vec_id"),
        col(embCol).cast("array<double>").as("v"))
      .withColumn("nrm", graft.functions.VectorExpressions.l2norm($"v"))

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Exact cosine top-k of each query vector against the corpus (self
    * excluded). Query side is broadcast (small by construction).
    * Output: (qid, nid, rank), rank 1..k by sim desc, ties by nid.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, embCol: String,
                     queryPred: Column, k: Int): DataFrame = {
    val n = withNorm(corpus, idCol, embCol)
    val q = n.filter(queryPred)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))
    // rank on round(sim, 9): kills last-ulp FP-order noise across engines
    // while never reordering genuinely distinct neighbors
    val scored = n.join(broadcast(q), $"vec_id" =!= $"qid")
      .withColumn("sim", round(dot($"qv", $"v") / ($"qn" * $"nrm"), 9))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"vec_id".as("nid"), $"rank".cast("long").as("rank"))
  }

  /** Random-hyperplane signature: `bits` sign bits, hyperplane h_j
    * derived deterministically from a splitmix of (table, j, dim-index)
    * mapped to ±1 components (a dense Rademacher projection — standard
    * SimHash-for-cosine construction, no stored model). `table` selects
    * an INDEPENDENT hyperplane family for multi-table LSH. Delegates to
    * the single-pass primitive kernel (per-element Catalyst expansion
    * overflows Janino's method-size limit at realistic dims).
    */
  def planeSignature(v: Column, dim: Int, bits: Int, table: Int = 0): Column =
    element_at(graft.functions.VectorExpressions.plane_sigs(
      v, dim, bits, table + 1), table + 1)

  /** exploded (table_idx, signature) rows for `tables` independent
    * hash tables — the multi-table LSH index. A pair within cosine angle
    * θ collides in one table with p^bits (p = 1 − θ/π); across L tables
    * the miss probability decays to (1 − p^bits)^L — the recall knob
    * that a single table lacks. All signatures come from ONE primitive
    * kernel pass ([[graft.functions.VectorExpressions.plane_sigs]]).
    */
  private def withTables(n: DataFrame, dim: Int, bits: Int,
                         tables: Int): DataFrame =
    n.select($"vec_id", $"v", $"nrm",
        posexplode(graft.functions.VectorExpressions.plane_sigs(
          $"v", dim, bits, tables)).as(Seq("tbl", "sig")))

  /** Embedding-cosine near-duplicate pairs: multi-table random-hyperplane
    * buckets block the corpus, exact cosine verifies within-bucket
    * pairs — the embedding-space member of the dedup family (complements
    * MinHash/SimHash text dedup). Output (id_a < id_b, sim ≥ threshold).
    *
    * Shuffle profile at scale: tables × one bucket-keyed self-join over
    * (tbl, sig) — never all-pairs; the pair-dedup and the exact verify
    * touch only colliding candidates. Recall quantified in OperatorsSpec.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
                         dim: Int, bits: Int, threshold: Double,
                         tables: Int = 16): DataFrame = {
    val n = withNorm(corpus, idCol, embCol)
    val t = withTables(n, dim, bits, tables)
    val candidates = t.as("a").join(t.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    candidates
      .join(n.select($"vec_id".as("id_a"), $"v".as("va"), $"nrm".as("na")), Seq("id_a"))
      .join(n.select($"vec_id".as("id_b"), $"v".as("vb"), $"nrm".as("nb")), Seq("id_b"))
      .withColumn("sim", round(dot($"va", $"vb") / ($"na" * $"nb"), 9))
      .filter($"sim" >= threshold)
      .select($"id_a", $"id_b", $"sim")
  }

  /** Spherical-k-means coarse quantizer for [[ivfTopK]], trained as
    * Spark aggregations — the driver only ever holds the nlist×dim
    * centroid matrix, never data. Deterministic throughout: seeds are
    * the `nlist` vectors with the smallest (xxhash64(id), id); each
    * Lloyd's round assigns via the codegen'd
    * [[graft.functions.VectorExpressions.nearest_centroids]] kernel and
    * re-estimates means with one (cid, pos) aggregation; means are
    * re-normalized to unit L2 and ROUNDED to 9 decimals so shuffle-order
    * FP noise can never leak into assignments. Empty clusters keep their
    * previous centroid.
    *
    * At 100 TB train on a hash-sample (`sampleMod` > 1): IVF quantizers
    * are customarily trained on a corpus sample (the sample is the only
    * thing the `iters+1` training scans touch); assignment in
    * [[ivfTopK]] still covers every row.
    *
    * Returns the flat row-major unit-norm centroid matrix.
    */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, embCol: String,
                        dim: Int, nlist: Int, iters: Int = 3,
                        sampleMod: Int = 1): Array[Double] = {
    val n0 = withNorm(corpus, idCol, embCol).filter($"nrm" > 0)
    val sampled =
      if (sampleMod > 1)
        n0.filter(pmod(xxhash64($"vec_id"), lit(sampleMod)) === 0)
      else n0
    // unit rows: spherical k-means clusters directions, not magnitudes
    val u = sampled
      .select($"vec_id", transform($"v", x => x / $"nrm").as("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[Double] = u
        .orderBy(xxhash64($"vec_id"), $"vec_id").limit(nlist)
        .select($"u").collect()
        .flatMap(_.getSeq[Double](0).padTo(dim, 0.0).take(dim))
      val nl = cents.length / dim
      if (nl == 0) return cents
      var it = 0
      while (it < iters) {
        val stats = u.select(
            element_at(graft.functions.VectorExpressions.nearest_centroids(
              $"u", cents, dim, 1), 1).as("cid"),
            posexplode($"u").as(Seq("pos", "x")))
          .groupBy($"cid", $"pos")
          .agg(sum($"x").as("s"), count(lit(1)).as("cnt"))
          .collect()
        val sums = new Array[Double](nl * dim)
        val cnts = new Array[Long](nl)
        stats.foreach { r =>
          val cid = r.getInt(0); val pos = r.getInt(1)
          if (cid < nl && pos < dim) {
            sums(cid * dim + pos) = r.getDouble(2)
            cnts(cid) = r.getLong(3)
          }
        }
        val next = new Array[Double](nl * dim)
        var c = 0
        while (c < nl) {
          val off = c * dim
          if (cnts(c) == 0L) {
            System.arraycopy(cents, off, next, off, dim)
          } else {
            var s2 = 0.0
            var i = 0
            while (i < dim) {
              val m = sums(off + i) / cnts(c); next(off + i) = m; s2 += m * m
              i += 1
            }
            val inv = if (s2 > 0) 1.0 / math.sqrt(s2) else 0.0
            i = 0
            while (i < dim) {
              next(off + i) = math.rint(next(off + i) * inv * 1e9) / 1e9
              i += 1
            }
          }
          c += 1
        }
        cents = next
        it += 1
      }
      cents
    } finally u.unpersist(blocking = false)
  }

  /** IVF approximate top-k — the partition-pruned ANN scale path.
    * A spherical-k-means coarse quantizer ([[trainIvfCentroids]])
    * assigns every corpus vector ONE inverted list (`cid`) in a single
    * codegen'd map-side pass (nlist·dim FMAs per row — no row blowup,
    * unlike a centroid cross-join); each query probes its `nProbe`
    * nearest lists and only those candidates are scored exactly.
    *
    * Shuffle profile at scale: queries (small by construction) broadcast
    * with their probe lists exploded, the corpus STREAMS map-side
    * through assignment + hash-join — zero corpus shuffle, and only
    * ~nProbe/nlist of the corpus reaches the scoring kernel. For
    * repeated query batches, persist the assigned corpus partitioned by
    * `cid` once and skip re-assignment. Recall vs [[bruteForceTopK]] is
    * quantified in OperatorsSpec.
    */
  def ivfTopK(corpus: DataFrame, idCol: String, embCol: String,
              queryPred: Column, k: Int, dim: Int, nlist: Int,
              nProbe: Int, iters: Int = 3, sampleMod: Int = 1): DataFrame = {
    val cents = trainIvfCentroids(corpus, idCol, embCol, dim, nlist,
      iters, sampleMod)
    val n = withNorm(corpus, idCol, embCol)
    // raw-vector dot vs unit centroids = cosine argmax (norm is constant
    // per row) — assignment never divides or normalizes
    val assigned = n.withColumn("cid",
      element_at(graft.functions.VectorExpressions.nearest_centroids(
        $"v", cents, dim, 1), 1))
    val q = n.filter(queryPred)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))
      .withColumn("cid", explode(
        graft.functions.VectorExpressions.nearest_centroids(
          $"qv", cents, dim, nProbe)))
    // a corpus row has ONE cid and probe cids are distinct, so no
    // candidate pair can appear twice — no dedup stage needed
    val scored = assigned.join(broadcast(q), Seq("cid"))
      .filter($"vec_id" =!= $"qid")
      .withColumn("sim", dot($"qv", $"v") / ($"qn" * $"nrm"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"vec_id".as("nid"), $"rank".cast("long").as("rank"),
        $"sim")
  }

  /** Per-subspace product-quantization codebooks (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
    * algorithm), trained as Spark aggregations: plain L2 k-means in each
    * of the `m` subspaces of `subdim = dim/m` dims, `ks` codewords each.
    * Deterministic like [[trainIvfCentroids]]: seeds are the `ks` rows
    * with smallest (xxhash64(id), id) (subvectors of the SAME rows seed
    * every subspace), assignment ties break to the lower code id inside
    * the codegen'd kernel, means are rounded to 9 decimals so
    * shuffle-order FP noise cannot flip assignments, empty cells keep
    * their previous codeword. Each Lloyd's round is ONE pass: the encode
    * kernel + a (subspace, code, dim-index) aggregation — the driver only
    * holds the m·ks·subdim matrix. Train on a hash-sample at scale
    * (`sampleMod` > 1), like any PQ index build.
    *
    * Returns the flat codebook matrix laid out
    * codebooks[((mm·ks)+j)·subdim + i].
    */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, embCol: String,
                       dim: Int, m: Int, ks: Int, iters: Int = 3,
                       sampleMod: Int = 1): Array[Double] = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val subdim = dim / m
    val n0 = withNorm(corpus, idCol, embCol)
    val sampled =
      if (sampleMod > 1)
        n0.filter(pmod(xxhash64($"vec_id"), lit(sampleMod)) === 0)
      else n0
    val u = sampled.select($"vec_id", $"v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seedRows = u.orderBy(xxhash64($"vec_id"), $"vec_id").limit(ks)
        .select($"v").collect()
        .map(_.getSeq[Double](0).padTo(dim, 0.0).toArray)
      if (seedRows.isEmpty) return new Array[Double](0)
      var cbs = new Array[Double](m * ks * subdim)
      for (mm <- 0 until m; j <- 0 until ks) {
        // wrap when the corpus has < ks rows: duplicate codewords are
        // harmless (argmin ties to the lower id; the copies stay empty)
        val src = seedRows(j % seedRows.length)
        System.arraycopy(src, mm * subdim, cbs, ((mm * ks) + j) * subdim, subdim)
      }
      var it = 0
      while (it < iters) {
        val enc = graft.functions.VectorExpressions
          .pq_encode($"v", cbs, dim, m, ks)
        val stats = u.select(enc.as("codes"), posexplode($"v").as(Seq("pos", "x")))
          .filter($"pos" < dim)
          .select(($"pos" / lit(subdim)).cast("int").as("mm"),
            element_at($"codes", ($"pos" / lit(subdim)).cast("int") + 1).as("code"),
            ($"pos" % lit(subdim)).cast("int").as("i"),
            $"x")
          .groupBy($"mm", $"code", $"i")
          .agg(sum($"x").as("s"), count(lit(1)).as("cnt"))
          .collect()
        val sums = new Array[Double](m * ks * subdim)
        val cnts = new Array[Long](m * ks)
        stats.foreach { r =>
          val mm = r.getInt(0); val code = r.getInt(1); val i = r.getInt(2)
          if (mm < m && code < ks && i < subdim) {
            sums(((mm * ks) + code) * subdim + i) = r.getDouble(3)
            // per-(mm,code) divisor = the MAX per-i count: for fixed-dim
            // vectors all i agree; for shorter (zero-padded-by-encode)
            // vectors the per-i counts differ and a plain overwrite made
            // the surviving divisor depend on collect() row order
            // (ADVICE r4) — max is the well-defined row count of the cell
            val cell = mm * ks + code
            if (r.getLong(4) > cnts(cell)) cnts(cell) = r.getLong(4)
          }
        }
        val next = new Array[Double](m * ks * subdim)
        var c = 0
        while (c < m * ks) {
          val off = c * subdim
          if (cnts(c) == 0L) System.arraycopy(cbs, off, next, off, subdim)
          else {
            var i = 0
            while (i < subdim) {
              next(off + i) = math.rint(sums(off + i) / cnts(c) * 1e9) / 1e9
              i += 1
            }
          }
          c += 1
        }
        cbs = next
        it += 1
      }
      cbs
    } finally u.unpersist(blocking = false)
  }

  /** PQ approximate top-k with asymmetric-distance scoring and exact
    * re-rank — the MEMORY-COMPRESSION ANN scale path (complements
    * [[ivfTopK]]'s partition pruning): the scan ranks against `m` small
    * ints + one norm per row (m + 8 bytes ≈ 32× less than dim raw
    * floats at dim=64, m=8), so a 100 TB embedding corpus's scorable
    * representation fits the cluster's memory. dot(q,x) is approximated
    * by Σ_mm lut[codes[mm]] — a per-query lookup table of m·ks partial
    * dots built ONCE by a codegen'd kernel; each candidate costs m array
    * reads. The `refine·k` best approximate hits per query are then
    * re-scored EXACTLY against raw vectors (fetched for the shortlist
    * only — a semi-join against the full corpus, never a second scan).
    *
    * Shuffle profile: queries broadcast with their LUTs; the code table
    * streams map-side (zero corpus shuffle); the refine join moves only
    * |Q|·refine·k rows. Recall vs [[bruteForceTopK]] quantified in
    * OperatorsSpec.
    */
  def pqTopK(corpus: DataFrame, idCol: String, embCol: String,
             queryPred: Column, k: Int, dim: Int, m: Int, ks: Int,
             iters: Int = 3, sampleMod: Int = 1,
             refine: Int = 8): DataFrame = {
    val cbs = trainPqCodebooks(corpus, idCol, embCol, dim, m, ks,
      iters, sampleMod)
    val n = withNorm(corpus, idCol, embCol)
    val codes = n.select($"vec_id",
      graft.functions.VectorExpressions.pq_encode($"v", cbs, dim, m, ks)
        .as("codes"),
      $"nrm")
    val q = n.filter(queryPred)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))
      .withColumn("lut",
        graft.functions.VectorExpressions.pq_lut($"qv", cbs, dim, m, ks))
    val approx = codes.join(broadcast(q.select($"qid", $"qn", $"lut")),
        $"vec_id" =!= $"qid")
      .withColumn("asim",
        graft.functions.VectorExpressions.pq_adc($"codes", $"lut", ks) /
          ($"qn" * $"nrm"))
    val wA = Window.partitionBy($"qid").orderBy($"asim".desc, $"vec_id".asc)
    val short = approx.withColumn("arank", row_number().over(wA))
      .filter($"arank" <= math.max(k, refine * k))
      .select($"qid", $"vec_id")
    val scored = short
      .join(n, Seq("vec_id"))
      .join(broadcast(q.select($"qid", $"qv", $"qn")), Seq("qid"))
      .withColumn("sim", round(dot($"qv", $"v") / ($"qn" * $"nrm"), 9))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"vec_id".as("nid"), $"rank".cast("long").as("rank"),
        $"sim")
  }

  /** Composed IVF-PQ approximate top-k (IVFADC, Jégou et al. TPAMI 2011
    * §III — public algorithm): the production ANN shape at 10^10 vectors,
    * where BOTH scale levers are needed at once — [[ivfTopK]]'s partition
    * pruning (only ~nProbe/nlist of the corpus is ever scored) AND
    * [[pqTopK]]'s memory compression (the scored representation is m
    * small ints + one norm per row, not dim raw doubles). The stored
    * index is (vec_id, cid, codes, nrm): a coarse spherical-k-means
    * quantizer assigns every row ONE inverted list map-side; PQ codes
    * (plain per-row codes — the residual-encoding refinement changes
    * only the encode/LUT inputs, not the plan shape) approximate
    * dot(q,x) inside the probed lists via the per-query LUT; the
    * `refine·k` best approximate hits per query are re-scored EXACTLY
    * against raw vectors fetched for the shortlist only.
    *
    * Shuffle profile at scale: queries broadcast with probe lists
    * exploded and LUTs attached; the (cid, codes) index streams map-side
    * through one hash join — ZERO corpus shuffle; the refine join moves
    * |Q|·refine·k rows. Recall/determinism gated in OperatorsSpec like
    * the component operators.
    */
  def ivfPqTopK(corpus: DataFrame, idCol: String, embCol: String,
                queryPred: Column, k: Int, dim: Int, nlist: Int,
                nProbe: Int, m: Int, ks: Int, iters: Int = 3,
                sampleMod: Int = 1, refine: Int = 8): DataFrame = {
    val cents = trainIvfCentroids(corpus, idCol, embCol, dim, nlist,
      iters, sampleMod)
    val cbs = trainPqCodebooks(corpus, idCol, embCol, dim, m, ks,
      iters, sampleMod)
    val n = withNorm(corpus, idCol, embCol)
    // the compressed, list-partitioned index: one codegen'd map-side pass
    val index = n.select($"vec_id",
      element_at(graft.functions.VectorExpressions.nearest_centroids(
        $"v", cents, dim, 1), 1).as("cid"),
      graft.functions.VectorExpressions.pq_encode($"v", cbs, dim, m, ks)
        .as("codes"),
      $"nrm")
    val qBase = n.filter(queryPred)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))
    val q = qBase
      .withColumn("lut",
        graft.functions.VectorExpressions.pq_lut($"qv", cbs, dim, m, ks))
      .withColumn("cid", explode(
        graft.functions.VectorExpressions.nearest_centroids(
          $"qv", cents, dim, nProbe)))
    // a corpus row lives in ONE list and probe cids are distinct, so no
    // (qid, vec_id) pair can appear twice — no dedup stage needed
    val approx = index.join(broadcast(q.select($"cid", $"qid", $"qn", $"lut")),
        Seq("cid"))
      .filter($"vec_id" =!= $"qid")
      .withColumn("asim",
        graft.functions.VectorExpressions.pq_adc($"codes", $"lut", ks) /
          ($"qn" * $"nrm"))
    val wA = Window.partitionBy($"qid").orderBy($"asim".desc, $"vec_id".asc)
    val short = approx.withColumn("arank", row_number().over(wA))
      .filter($"arank" <= math.max(k, refine * k))
      .select($"qid", $"vec_id")
    val scored = short
      .join(n, Seq("vec_id"))
      .join(broadcast(qBase), Seq("qid"))
      .withColumn("sim", round(dot($"qv", $"v") / ($"qn" * $"nrm"), 9))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"vec_id".as("nid"), $"rank".cast("long").as("rank"),
        $"sim")
  }

  /** Multi-table LSH approximate top-k: queries probe their bucket in
    * each of `tables` independent hash tables; the candidate union is
    * ranked by exact cosine. `bits` trades bucket size vs per-table
    * recall; `tables` drives the union's recall toward 1 (quantified in
    * OperatorsSpec vs bruteForceTopK).
    */
  def lshTopK(corpus: DataFrame, idCol: String, embCol: String,
              queryPred: Column, k: Int, dim: Int, bits: Int,
              tables: Int = 8): DataFrame = {
    val n = withNorm(corpus, idCol, embCol)
    val t = withTables(n, dim, bits, tables)
    val q = t.filter(queryPred)
      .select($"vec_id".as("qid"), $"tbl", $"sig")
    val candidates = t.join(q, Seq("tbl", "sig"), "inner")
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id").distinct()
    val qv = n.select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))
    val scored = candidates
      .join(n, Seq("vec_id"))
      .join(qv, Seq("qid"))
      .withColumn("sim", dot($"qv", $"v") / ($"qn" * $"nrm"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"vec_id".as("nid"), $"rank".cast("long").as("rank"),
        $"sim")
  }
}
