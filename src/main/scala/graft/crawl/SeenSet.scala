package graft
package crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The URL-seen set (J1): exact membership = left-anti join of candidates
  * against the append-only keys log on `urlKey`, with a sharded-Bloom
  * prefilter ([[ShardedBloom]]).
  *
  * The reference's seen set is `pages.url UNIQUE` + `INSERT OR IGNORE`
  * (/root/reference/storage_tools/_datacollector_statements.py:13,
  * datacollector.py:292-303) — exact by construction. Exactness here is
  * guaranteed by the anti-join BACKSTOP; the Bloom probe only lets the
  * (overwhelmingly common at crawl steady state) already-seen candidates
  * skip the join entirely:
  *   - mightContain == false  → provably unseen → keep, no join needed
  *   - mightContain == true   → suspect → exact anti-join decides
  * False-positive rate therefore affects only how many rows pay the
  * join, never correctness (SURVEY.md §2.9).
  *
  * Scale: the keys log is urlKey-only (8 bytes/row columnar); on a
  * cluster it is an Iceberg table bucketed by urlKey, making the suspect
  * anti-join storage-partitioned (no shuffle of the big side) with the
  * shard filters aligned bucket-for-bucket.
  */
object SeenSet {

  /** Candidates strictly newer than the seen keys, exact. `probe` (from
    * [[ShardedBloom.probe]]) must be a SUPERSET test of the seen keys —
    * callers only pass filters maintained over every committed key.
    */
  def filterNew(candidates: DataFrame, seenKeys: DataFrame,
                probe: Option[Column => Column]): DataFrame =
    probe match {
      case None =>
        candidates.join(seenKeys.select("urlKey"), Seq("urlKey"), "left_anti")
      case Some(mightContain) =>
        val definitelyNew = candidates.filter(!mightContain(col("urlKey")))
        val suspects = candidates.filter(mightContain(col("urlKey")))
          .join(seenKeys.select("urlKey"), Seq("urlKey"), "left_anti")
        definitelyNew.unionByName(suspects)
    }
}
