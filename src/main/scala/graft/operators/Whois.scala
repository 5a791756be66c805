package graft
package operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S9/A5 — WHOIS enrichment as a table fold (the reference queries the
  * external whois service per domain and folds multi-valued registry
  * fields into one row, /root/reference/extraction_tools/
  * whoisinfo.py:39-112 + storage_tools/datacollector.py:47-75).
  *
  * The network call is out of scope in this sandbox (and flaky in the
  * reference — it swallows every exception); what IS table logic is the
  * fold, ported exactly:
  *   - creation_date  = MIN of the list        (whoisinfo.py:106-112)
  *   - updated_date   = MAX of the list        (whoisinfo.py:50-55)
  *   - expiration_date= MAX of the list        (whoisinfo.py:57-61)
  *   - country/state/status = FIRST of the list (whoisinfo.py:77-103)
  * All built-in expressions (array_min/array_max/element_at) — one
  * narrow projection, no shuffle; one row per domain like the
  * reference's single replaced `whois_record` row.
  */
object Whois {

  /** Fold raw multi-valued registry records (one row per domain with
    * array-typed fields) into the reference's single-valued record.
    */
  def fold(records: DataFrame): DataFrame =
    records.select(
      col("domain"),
      array_min(col("creation_dates")).as("creation_date"),
      array_max(col("updated_dates")).as("updated_date"),
      array_max(col("expiration_dates")).as("expiration_date"),
      element_at(col("countries"), 1).as("country"),
      element_at(col("states"), 1).as("state"),
      element_at(col("statuses"), 1).as("status"))

  /** Deterministic fixture records for a domain list — the stand-in for
    * the external whois service (SURVEY.md §2 S9: "synth fixture row if
    * needed"). Values derive purely from the domain string.
    */
  def fixture(spark: org.apache.spark.sql.SparkSession,
              domains: Seq[String]): DataFrame = {
    import spark.implicits._
    domains.map { d =>
      val a = if (d.isEmpty) 0L else d.charAt(0).toLong
      val l = d.length.toLong
      val e0 = 1000000000L
      (d,
        Seq(e0 + a * 86400, e0 + l * 3600),
        Seq(e0 + a * 172800, e0 + l * 7200),
        Seq(e0 + a * 259200, e0 + l * 10800),
        Seq(Seq("IT", "US", "FR")((l % 3).toInt)),
        Seq("NA"),
        Seq("ok", "reg"))
    }.toDF("domain", "creation_s", "updated_s", "expiration_s",
        "countries", "states", "statuses")
      .select($"domain",
        transform($"creation_s", timestamp_seconds(_)).as("creation_dates"),
        transform($"updated_s", timestamp_seconds(_)).as("updated_dates"),
        transform($"expiration_s", timestamp_seconds(_)).as("expiration_dates"),
        $"countries", $"states", $"statuses")
  }
}
