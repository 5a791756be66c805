package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the URL canonicalizer (SURVEY.md §5.2). ScalaCheck
  * generators driven directly with fixed seeds (no scalatestplus bridge in
  * the offline cache), so runs are deterministic.
  */
class UrlPropsSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val hostGen = for {
    sub <- Gen.oneOf("", "www.", "news.", "www2.")
    name <- Gen.alphaLowerStr.suchThat(s => s.nonEmpty && s.length < 12)
    tld <- Gen.oneOf("it", "com", "org", "co.uk")
  } yield s"$sub$name.$tld"

  private val urlGen = for {
    scheme <- Gen.oneOf("http", "https")
    host <- hostGen
    segs <- Gen.listOfN(3, Gen.alphaNumStr.suchThat(s => s.nonEmpty && s.length < 10))
    trailing <- Gen.oneOf("", "/")
    query <- Gen.oneOf("", "?a=1", "?utm=x&b=2")
  } yield s"$scheme://$host/${segs.mkString("/")}$trailing$query"

  test("clean_url is idempotent") {
    for (u <- samples(urlGen)) {
      val once = UrlOps.cleanUrl(u)
      assert(UrlOps.cleanUrl(once) == once, s"u=$u")
    }
  }

  test("are_equals_urls(u, clean(u, keepargs)) holds") {
    for (u <- samples(urlGen))
      assert(UrlOps.areEqualsUrls(u, UrlOps.cleanUrl(u, removeArguments = false)), s"u=$u")
  }

  test("canonicalKey strips scheme and is idempotent") {
    for (u <- samples(urlGen)) {
      val key = UrlOps.canonicalKey(u)
      assert(!key.startsWith("http://") && !key.startsWith("https://"), s"u=$u")
      assert(UrlOps.canonicalKey("https://" + key) == key, s"u=$u")
    }
  }

  test("unquote round-trips plain ASCII without escapes") {
    for (s <- samples(Gen.alphaNumStr)) assert(PyUrl.unquote(s) == s)
  }

  test("unquote decodes UTF-8 multibyte sequences") {
    assert(PyUrl.unquote("%e2%82%ac") == "€")
    assert(PyUrl.unquote("a%20b") == "a b")
    assert(PyUrl.unquote("%zz") == "%zz")
    assert(PyUrl.unquote("100%") == "100%")
  }
}
