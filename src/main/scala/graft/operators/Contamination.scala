package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Benchmark decontamination for training corpora: flag every corpus
  * document that shares at least one exact word n-gram with a benchmark
  * (evaluation) set — the GPT-3 appendix-C / PaLM style exact-overlap
  * filter. No reference counterpart (the reference crawls, it does not
  * curate training data); this is a new-engine training-pipeline
  * operator, like the dedup family in [[Dedup]].
  *
  * Scale shape (100 TB corpus vs a benchmark of at most a few GB):
  *  - each side's n-grams reduce to a 128-bit MD5 key MAP-SIDE, so the
  *    only bytes that ever move are 16-byte digests, never gram text
  *    (MD5 rather than xxhash64 so a SQL oracle can replay the key
  *    derivation bit-for-bit);
  *  - the benchmark key set is distinct-ed and BROADCAST — the corpus
  *    side streams through a broadcast semi/inner join with zero corpus
  *    shuffle for the match itself;
  *  - the per-doc distinct + count groups on (doc, digest): one shuffle
  *    of O(matched grams), not O(corpus grams), because the broadcast
  *    join runs first.
  */
object Contamination {

  /** Per-document count of DISTINCT benchmark n-grams present.
    *
    * @param docs        corpus+benchmark rows
    * @param idCol       document id column name
    * @param textCol     whitespace-tokenizable text column name
    * @param isBench     predicate marking benchmark rows; all other rows
    *                    form the corpus under test
    * @param n           n-gram width in tokens (8 is the common
    *                    published choice for exact-overlap filters)
    * @return one row per NON-benchmark doc: (idCol, n_hits long) —
    *         n_hits = 0 means clean, > 0 means contaminated
    */
  def ngramHits(docs: DataFrame, idCol: String, textCol: String,
                isBench: Column, n: Int): DataFrame = {
    val id = col(idCol)
    val grams = docs
      .select(id, isBench.as("is_bench"),
        TextOps.shingles(TextOps.tokens(col(textCol)), n).as("gs"))
      .select(id, col("is_bench"),
        explode(transform(col("gs"), g => md5(g.cast("binary")))).as("gh"))
    val bench = grams.filter(col("is_bench")).select(col("gh")).distinct()
    // the broadcast join runs FIRST (bench keys are distinct, so the join
    // never multiplies rows); only MATCHED (doc, digest) grams reach the
    // distinct's shuffle — the corpus itself never shuffles. (ADVICE r4:
    // the r4 order ran distinct below the join, shuffling O(corpus grams).)
    val hits = grams.filter(!col("is_bench"))
      .select(id, col("gh"))
      .join(broadcast(bench), Seq("gh"))
      .distinct()
      .groupBy(id).agg(count(lit(1)).as("n_hits"))
    docs.filter(!isBench)
      .select(id)
      .join(hits, Seq(idCol), "left")
      .select(id, coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }
}
