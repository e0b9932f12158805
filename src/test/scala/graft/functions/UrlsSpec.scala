package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** URL canonicalization rules, one test per documented rule, plus the
  * idempotence property (canonicalize of a canonical URL is itself) over
  * generated messy URLs.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u"))).as[String].collect().toSeq

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/A/B") == Seq("https://www.example.com/A/B"))
  }

  test("default ports dropped, non-default kept") {
    assert(canon(
      "https://a.com:443/x", "http://a.com:80/x", "https://a.com:8080/x") ==
      Seq("https://a.com/x", "http://a.com/x", "https://a.com:8080/x"))
  }

  test("fragment dropped, trailing slashes stripped (root becomes bare origin)") {
    assert(canon("https://a.com/x/#top", "https://a.com/", "https://a.com") ==
      Seq("https://a.com/x", "https://a.com", "https://a.com"))
  }

  test("tracking params removed, remaining params sorted; all-tracking query vanishes") {
    assert(canon(
      "https://a.com/x?b=2&utm_source=f&a=1",
      "https://a.com/x?utm_campaign=x&ref=home",
      "https://a.com/x?gclid=1&fbclid=2") ==
      Seq("https://a.com/x?a=1&b=2", "https://a.com/x", "https://a.com/x"))
  }

  test("empty query segments vanish: trailing '&', lone '?', doubled '&&'") {
    assert(canon(
      "https://a.com/x?b=2&utm_source=f&",
      "https://a.com/x?b=2&utm_source=f",
      "https://a.com/x?",
      "https://a.com/x?a=1&&b=2") ==
      Seq("https://a.com/x?b=2", "https://a.com/x?b=2",
        "https://a.com/x", "https://a.com/x?a=1&b=2"))
  }

  test("userinfo is dropped: credentials never reach a dedup key") {
    assert(canon("https://user:pw@a.com/x", "https://user@a.com:8080/x") ==
      Seq("https://a.com/x", "https://a.com:8080/x"))
  }

  test("malformed URL yields null, not a half-canonical string") {
    val out = Seq("not a url", "http://").toDF("u")
      .select(Urls.canonicalize(col("u"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("dedupKey strips leading www. after canonicalizing; non-leading www kept") {
    val out = Seq(
      "HTTPS://WWW.A.com:443/p/", "https://a.com/p", "https://www2.a.com/p",
      "https://sub.www.a.com/p",
      // www IS the registrable label: stripping would alias another origin
      "https://www.com/p", "https://www.com:8080/p")
      .toDF("u").select(Urls.dedupKey(col("u"))).as[String].collect().toSeq
    assert(out == Seq(
      "https://a.com/p", "https://a.com/p", "https://www2.a.com/p",
      "https://sub.www.a.com/p",
      "https://www.com/p", "https://www.com:8080/p"))
  }

  test("dedupKey PSL guards: no strip onto (or off of) a bare public suffix") {
    val out = Seq(
      // post-strip host would be the bare multi-label suffix co.uk
      "https://www.co.uk/p",
      // pre-strip host is itself a public suffix under *.kawasaki.jp
      "https://www.kawasaki.jp/p",
      // ordinary hosts under the same suffixes still strip
      "https://www.news.co.uk/p", "https://www.city.kawasaki.jp/p")
      .toDF("u").select(Urls.dedupKey(col("u"))).as[String].collect().toSeq
    assert(out == Seq(
      "https://www.co.uk/p", "https://www.kawasaki.jp/p",
      "https://news.co.uk/p", "https://city.kawasaki.jp/p"))
  }

  test("registeredDomain: PSL rules — normal, multi-label, wildcard, exception") {
    val out = Seq("www.a.example.com", "a.news.co.uk", "example.com",
      "x.shop.web.ck", "a.www.ck", "x.city.kawasaki.jp")
      .toDF("h").select(Urls.registeredDomain(col("h"))).as[String].collect().toSeq
    assert(out == Seq("example.com", "news.co.uk", "example.com",
      "shop.web.ck", "www.ck", "city.kawasaki.jp"))
  }

  test("registeredDomain: a bare public suffix or single label has no registrable part") {
    val out = Seq("co.uk", "localhost")
      .toDF("h").select(Urls.registeredDomain(col("h"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("canonicalize is idempotent over generated messy URLs") {
    val scheme = Gen.oneOf("http", "HTTP", "https", "HTTPS")
    val host = Gen.oneOf("A.Example.COM", "www.b.co.uk", "x.org", "CDN.y.net")
    val port = Gen.oneOf("", ":80", ":443", ":8080")
    val path = Gen.oneOf("", "/", "/A", "/a/b/", "/a//")
    val query = Gen.oneOf("", "?b=2&a=1", "?utm_source=f", "?a=1&utm_medium=m&c=3")
    val frag = Gen.oneOf("", "#f", "#Frag")
    val url = for {
      s <- scheme; h <- host; po <- port; pa <- path; q <- query; f <- frag
    } yield s"$s://$h$po$pa$q$f"
    val prop = Prop.forAll(Gen.listOfN(30, url)) { urls =>
      val once = urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      val twice = once.select(col("c"), Urls.canonicalize(col("c")).as("c2"))
        .collect()
      twice.forall(r => !r.isNullAt(0) && r.getString(0) == r.getString(1))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
