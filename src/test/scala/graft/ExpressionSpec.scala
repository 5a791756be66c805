package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlExpressions

/** Native Catalyst URL expressions: value-equal to the pure functions on
  * the reference truth-table corpus, and codegen-resident (no UDF node
  * in the optimized plan).
  */
class ExpressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureUrls: Seq[String] = {
    val src = scala.io.Source.fromFile(
      "src/test/resources/fixtures/url_truth.tsv")(scala.io.Codec.ISO8859)
    try src.getLines().drop(1).map(_.split("\t")(0)).toList
    finally src.close()
  }

  test("expressions agree with the pure functions on the fixture corpus") {
    import spark.implicits._
    val urls = fixtureUrls
    val df = urls.toDF("url").select(
      $"url",
      UrlExpressions.is_news_url($"url").as("news"),
      UrlExpressions.is_navigable($"url").as("nav"),
      UrlExpressions.canonical_key($"url").as("ck"))
    df.collect().foreach { r =>
      val u = r.getString(0)
      assert(r.getBoolean(1) === NewsUrl.isNewsUrl(u), s"news($u)")
      assert(r.getBoolean(2) === UrlOps.isValidUrlToNavigate(u), s"nav($u)")
      assert(r.getString(3) === UrlOps.canonicalKey(u), s"ck($u)")
    }
    assert(urls.nonEmpty)
  }

  test("expressions stay inside whole-stage codegen (no UDF in plan)") {
    import spark.implicits._
    // non-foldable input so the optimizer can't constant-fold the plan
    val df = spark.range(100)
      .select(concat(lit("https://www.a.com/news/2024/01/02/x-"), $"id",
        lit(".html")).as("url"))
      .select(UrlExpressions.is_news_url($"url").as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    // '*(n)' is the compact WholeStageCodegen marker
    assert(plan.contains("*(1) Project [isnewsurlexpr"), plan)
    assert(df.collect().forall(_.getBoolean(0)))
  }

  test("robots disallow expression: value parity, null→allowed, codegen-resident") {
    import spark.implicits._
    val df = spark.range(60).select(
      concat(lit("https://www.a.com"),
        when(pmod($"id", lit(2)) === 0, concat(lit("/private/x-"), $"id"))
          .otherwise(concat(lit("/news/y-"), $"id"))).as("url"),
      when(pmod($"id", lit(3)) === 0,
          array(lit("A/private/x-1*"), lit("D/private/"), lit("D/tmp/")))
        .when(pmod($"id", lit(3)) === 1, lit(null).cast("array<string>"))
        .otherwise(array().cast("array<string>")).as("rules"))
    val out = df.select($"url", $"rules",
      UrlExpressions.robots_disallowed($"rules", $"url").as("dis"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    assert(plan.toLowerCase.contains("robotsdisallowedexpr"), plan)
    out.collect().foreach { r =>
      val u = r.getString(0)
      val rules = if (r.isNullAt(1)) null else r.getSeq[String](1)
      assert(r.getBoolean(2) ===
        graft.crawl.Robots.isDisallowedBy(rules, u), s"dis($u, $rules)")
    }
  }

  test("nfc normalize expression: Normalizer parity, null-safe, codegen-resident") {
    import spark.implicits._
    // spark.range keeps the input non-constant: ConvertToLocalRelation
    // would otherwise fold the expression away before the plan assert
    val df = spark.range(9).select(
        when(pmod($"id", lit(3)) === 0, concat(lit("e\u0301clair-"), $"id"))
          .when(pmod($"id", lit(3)) === 1, concat(lit("caf\u00e9-"), $"id"))
          .otherwise(lit(null).cast("string")).as("s"))
      .select($"s", graft.functions.TextExpressions.nfc_normalize($"s").as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    assert(plan.toLowerCase.contains("nfcnormalizeexpr"), plan)
    df.collect().foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getString(1) === java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC))
    }
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("https://www.a.com/x"))
      .toDF("url").select(UrlExpressions.canonical_key($"url").as("ck"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) || rows(1).isNullAt(0) === false)
  }
}
