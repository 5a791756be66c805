package graft
package crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The URL-seen set (J1): exact membership = left-anti join of candidates
  * against state on `urlKey`, with an optional Bloom prefilter.
  *
  * The reference's seen set is `pages.url UNIQUE` + `INSERT OR IGNORE`
  * (/root/reference/storage_tools/_datacollector_statements.py:13,
  * datacollector.py:292-303) — exact by construction. Exactness here is
  * guaranteed by the anti-join BACKSTOP; the Bloom filter is only a
  * prefilter that lets the (overwhelmingly common at crawl steady state)
  * already-seen candidates skip the shuffle entirely:
  *   - mightContain == false  → provably unseen → keep, no join needed
  *   - mightContain == true   → suspect → exact anti-join decides
  * False-positive rate therefore affects only how many rows pay the
  * shuffle, never correctness (SURVEY.md §2.9).
  *
  * Scale: at 10^10 seen URLs a single Bloom at 10 bits/key is ~12.5 GB —
  * too big to broadcast; the cluster path shards the state by
  * pmod(urlKey, P) and builds/probes one filter per shard (same API,
  * filter keyed by shard), or skips the prefilter and relies on the
  * bucketed sort-merge anti-join. Both paths keep the anti-join backstop.
  */
object SeenSet {

  import org.apache.spark.util.sketch.BloomFilter

  /** Candidates strictly newer than `seen`, exact. `bloom` must be a
    * SUPERSET of the seen keys (false positives fine — they just pay the
    * anti-join; false negatives would break exactness, so callers only
    * pass filters maintained over every committed key).
    */
  def filterNew(candidates: DataFrame, seen: DataFrame,
                bloom: Option[BloomFilter]): DataFrame = {
    val seenKeys = seen.select("urlKey")
    bloom match {
      case None =>
        candidates.join(seenKeys, Seq("urlKey"), "left_anti")
      case Some(bf) =>
        val bc = candidates.sparkSession.sparkContext.broadcast(bf)
        val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
        val definitelyNew = candidates.filter(!mightContain($"urlKey"))
        val suspects = candidates.filter(mightContain($"urlKey"))
          .join(seenKeys, Seq("urlKey"), "left_anti")
        definitelyNew.unionByName(suspects)
    }
  }

  /** Build a filter over a key DataFrame with a FIXED expected size so
    * successive per-wave filters are mergeable (`mergeInPlace` requires
    * identical geometry). Incremental maintenance makes the per-wave
    * bloom cost O(new keys), not O(total seen) — the same trick a
    * cluster run uses with per-partition persisted filters.
    */
  def buildBloom(keys: DataFrame, expectedItems: Long,
                 fpp: Double): BloomFilter =
    keys.stat.bloomFilter("urlKey", math.max(expectedItems, 1000L), fpp)
}
