package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PSL algorithm against known hosts: longest-match, wildcard (`*.`)
  * and exception (`!`) rules, the default rule, private-section entries,
  * and the parser itself.
  */
class PslSpec extends SparkSpec {
  import spark.implicits._

  test("resource parses: non-trivial rule sets, canonical entries present") {
    val r = Psl.rules
    assert(r.normal.size > 200, s"expected a substantial subset, got ${r.normal.size}")
    assert(r.normal.contains("com") && r.normal.contains("co.uk"))
    assert(r.wildcards.contains("ck") && r.wildcards.contains("kawasaki.jp"))
    assert(r.exceptions.contains("www.ck") && r.exceptions.contains("city.kawasaki.jp"))
    // parser invariants: no leading markers survive, everything lowercase
    assert((r.normal ++ r.wildcards ++ r.exceptions)
      .forall(s => !s.startsWith("!") && !s.startsWith("*") && s == s.toLowerCase))
  }

  test("parse handles comments, blanks, whitespace, and the bare default rule") {
    val r = Psl.parse(Iterator(
      "// comment", "", "  com  ", "*.ck", "!www.ck", "*", "Co.UK"))
    assert(r == Psl.Rules(Set("com", "co.uk"), Set("ck"), Set("www.ck")))
  }

  private def check(cases: (String, (Int, String, Any))*): Unit = {
    val hosts = cases.map(_._1)
    val out = hosts.toDF("h")
      .select(Psl.publicSuffixLabels(col("h")), Psl.publicSuffix(col("h")),
        Psl.registeredDomain(col("h")))
      .collect()
    cases.zip(out).foreach { case ((h, (psn, ps, rd)), row) =>
      assert(row.getInt(0) == psn, s"psn($h)")
      assert(row.getString(1) == ps, s"publicSuffix($h)")
      assert((if (row.isNullAt(2)) null else row.getString(2)) == rd,
        s"registeredDomain($h)")
    }
  }

  test("normal rules: longest match wins; bare suffix has no registrable part") {
    check(
      "a.example.com" -> ((1, "com", "example.com")),
      "example.com" -> ((1, "com", "example.com")),
      "com" -> ((1, "com", null)),
      "deep.a.news.co.uk" -> ((2, "co.uk", "news.co.uk")),
      "news.co.uk" -> ((2, "co.uk", "news.co.uk")),
      "co.uk" -> ((2, "co.uk", null)),
      // "uk" is also a rule, but "co.uk" (2 labels) prevails over it
      "uk" -> ((1, "uk", null)))
  }

  test("default rule: unknown TLD gets a 1-label public suffix; localhost has none") {
    check(
      "a.b.unknowntld" -> ((1, "unknowntld", "b.unknowntld")),
      "localhost" -> ((1, "localhost", null)))
  }

  test("wildcard rules: every second-level label under *.ck is a public suffix") {
    check(
      "web.ck" -> ((2, "web.ck", null)),
      "shop.web.ck" -> ((2, "web.ck", "shop.web.ck")),
      "deep.shop.web.ck" -> ((2, "web.ck", "shop.web.ck")),
      // the TLD itself only matches the default rule
      "ck" -> ((1, "ck", null)))
  }

  test("exception rules: !www.ck carves www.ck back out of *.ck") {
    check(
      "www.ck" -> ((1, "ck", "www.ck")),
      "a.www.ck" -> ((1, "ck", "www.ck")))
  }

  test("jp city blocks: wildcard + exception together") {
    check(
      // *.kawasaki.jp: third-level labels are public suffixes
      "sub.kawasaki.jp" -> ((3, "sub.kawasaki.jp", null)),
      "x.sub.kawasaki.jp" -> ((3, "sub.kawasaki.jp", "x.sub.kawasaki.jp")),
      // !city.kawasaki.jp: the city's own domain is registrable
      "city.kawasaki.jp" -> ((2, "kawasaki.jp", "city.kawasaki.jp")),
      "x.city.kawasaki.jp" -> ((2, "kawasaki.jp", "city.kawasaki.jp")),
      // kawasaki.jp itself falls through to the normal "jp" rule
      "kawasaki.jp" -> ((1, "jp", "kawasaki.jp")))
  }

  test("private-section rules: platform subdomains are distinct origins") {
    check(
      "alice.github.io" -> ((2, "github.io", "alice.github.io")),
      "bob.github.io" -> ((2, "github.io", "bob.github.io")),
      "a.b.s3.amazonaws.com" -> ((3, "s3.amazonaws.com", "b.s3.amazonaws.com")))
  }

  test("null host propagates null, never the default rule") {
    val out = Seq[(Integer, String)]((1, null)).toDF("i", "h")
      .select(Psl.publicSuffixLabels(col("h")), Psl.publicSuffix(col("h")),
        Psl.registeredDomain(col("h")))
      .collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }

  test("isPublicSuffix: the dedupKey strip guard") {
    val out = Seq("co.uk", "example.com", "web.ck", "www.ck", "kawasaki.jp",
      "sub.kawasaki.jp", "localhost")
      .toDF("h").select(Psl.isPublicSuffix(col("h"))).as[Boolean].collect().toSeq
    assert(out == Seq(true, false, true, false, false, true, true))
  }
}
