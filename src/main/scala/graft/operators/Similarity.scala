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
