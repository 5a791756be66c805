package graft
package operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *    O(|Q|·|N|) dot products but fully codegen'd (zip_with + aggregate,
  *    no UDF) and broadcast-joined when |Q| is small, so the big side
  *    streams with zero shuffle.
  *  - [[lshTopK]] — random-hyperplane LSH: b sign-bits bucket the corpus;
  *    queries probe only their own bucket (plus optional multi-probe via
  *    fewer bits). At 100 TB the bucket join shuffles each side once on
  *    the bucket key instead of materializing the cross product.
  */
object Similarity {

  /** embedding (array<float|double>) → array<double> plus L2 norm. */
  def withNorm(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vec_id"),
        transform(col(embCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate($"v", lit(0.0), (acc, x) => acc + x * x)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

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
    * derived deterministically from xxhash64(j, dim-index) mapped to
    * ±1 components (a dense Rademacher projection — standard SimHash-for-
    * cosine construction, no stored model).
    */
  def planeSignature(v: Column, dim: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      // s_j = sum_i sign(h(j,i)) * v_i ;  bit_j = s_j >= 0
      val s = (0 until dim).map { i =>
        val sgn = if (rademacher(j, i)) 1.0 else -1.0
        element_at(v, i + 1) * lit(sgn)
      }.reduce(_ + _)
      when(s >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Deterministic pseudo-random sign for hyperplane j, dimension i
    * (splitmix64 finalizer over (j<<32|i) — public-domain mix function).
    */
  private[operators] def rademacher(j: Int, i: Int): Boolean = {
    var z = (j.toLong << 32) | (i.toLong & 0xffffffffL)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z & 1L) == 0L
  }

  /** Embedding-cosine near-duplicate pairs: random-hyperplane buckets
    * block the corpus, exact cosine verifies within-bucket pairs — the
    * embedding-space member of the dedup family (complements MinHash/
    * SimHash text dedup). Output (id_a < id_b, sim ≥ threshold).
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
                         dim: Int, bits: Int, threshold: Double): DataFrame = {
    val n = withNorm(corpus, idCol, embCol)
      .withColumn("sig", planeSignature($"v", dim, bits))
    n.as("a").join(n.as("b"),
        col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 9))
      .filter($"sim" >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), $"sim")
  }

  /** LSH-bucketed approximate top-k: join query and corpus on the
    * signature bucket, rank within bucket. Recall < 1 by construction;
    * `bits` trades recall vs bucket size.
    */
  def lshTopK(corpus: DataFrame, idCol: String, embCol: String,
              queryPred: Column, k: Int, dim: Int, bits: Int): DataFrame = {
    val n = withNorm(corpus, idCol, embCol)
      .withColumn("sig", planeSignature($"v", dim, bits))
    val q = n.filter(queryPred)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"), $"sig")
    val scored = n.join(q, Seq("sig"), "inner")
      .filter($"vec_id" =!= $"qid")
      .withColumn("sim", dot($"qv", $"v") / ($"qn" * $"nrm"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"vec_id".as("nid"), $"rank".cast("long").as("rank"),
        $"sim")
  }
}
