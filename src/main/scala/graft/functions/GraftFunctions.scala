package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.{NewsUrl, UrlOps}

/** Spark-facing registration of the URL algebra (SURVEY.md §2.2, ported in
  * [[graft.UrlOps]]/[[graft.NewsUrl]] from /root/reference/utils.py and
  * /root/reference/newspaperlite/newsurl.py) plus text-analysis scalars.
  *
  * All UDFs are pure + deterministic (Spark assumes determinism and is free
  * to re-execute / reorder them — required for task retry correctness at
  * cluster scale). Hot-path predicates stay cheap: no regex compilation per
  * row (patterns are static vals in UrlOps/NewsUrl).
  */
object GraftFunctions {

  val cleanUrl = udf((u: String) => UrlOps.cleanUrl(u))
  val canonicalKey = udf((u: String) => UrlOps.canonicalKey(u))
  val principalDomain = udf((u: String) => UrlOps.getPrincipalDomain(u))
  val urlScheme = udf((u: String) => UrlOps.getScheme(u))
  val filetypeOf = udf((u: String) => UrlOps.getFiletypeFromUrl(u))
  val isValidUrl = udf((u: String) => UrlOps.isValidUrl(u))
  val isNavigable = udf((u: String) => UrlOps.isValidUrlToNavigate(u))
  val isNewsUrl = udf((u: String) => NewsUrl.isNewsUrl(u))
  val isDomainLink = udf((u: String, d: String) => UrlOps.isDomainLink(u, d))
  val langId = udf((t: String) => TextOps.langId(t))

  /** Canonical 64-bit frontier key: xxhash64 of the scheme-stripped
    * cleaned url (built-in expression — codegen'd, no UDF cost).
    */
  def urlKey(canonical: Column): Column = xxhash64(canonical)

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("clean_url", cleanUrl)
    spark.udf.register("canonical_key", canonicalKey)
    spark.udf.register("principal_domain", principalDomain)
    spark.udf.register("url_scheme", urlScheme)
    spark.udf.register("url_filetype", filetypeOf)
    spark.udf.register("is_valid_url", isValidUrl)
    spark.udf.register("is_navigable", isNavigable)
    spark.udf.register("is_news_url", isNewsUrl)
    spark.udf.register("is_domain_link", isDomainLink)
    spark.udf.register("lang_id", langId)
  }
}
