package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII scrub on crafted strings: every identifier class detected and
  * replaced, surrounding text intact, clean text untouched, and the
  * scrub is idempotent (placeholders never re-match). */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(ss: String*): Seq[(String, Int, Int, Int)] =
    ss.toDF("t")
      .select(Pii.scrub(col("t")),
        Pii.countEmails(col("t")), Pii.countIps(col("t")), Pii.countPhones(col("t")))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSeq

  test("each class detected and replaced; mixed identifiers coexist") {
    val out = scrub(
      "write to alice.b+test@mail.example.org today",
      "server 192.168.0.12 answered",
      "call 555-0199 now",
      "a@b.co and 10.0.0.1 and 555-1234")
    assert(out == Seq(
      ("write to <EMAIL> today", 1, 0, 0),
      ("server <IP> answered", 0, 1, 0),
      ("call <PHONE> now", 0, 0, 1),
      ("<EMAIL> and <IP> and <PHONE>", 1, 1, 1)))
  }

  test("clean text is untouched and the scrub is idempotent") {
    val clean = "no identifiers here just words and the number 42"
    val once = scrub(clean).head
    assert(once == ((clean, 0, 0, 0)))
    val mixed = "a@b.co and 10.0.0.1 and 555-1234"
    val twice = scrub(scrub(mixed).head._1).head
    assert(twice == (("<EMAIL> and <IP> and <PHONE>", 0, 0, 0)))
  }

  test("mixed-case emails mask; full NANP phones mask whole, any separator") {
    val out = scrub(
      "mail John.Doe@Example.COM or JANE@MAIL.EXAMPLE.ORG",
      "call 555-123-4567 or 555.123.4567 or 555 123 4567",
      "short form 555-1234 still masks")
    assert(out == Seq(
      ("mail <EMAIL> or <EMAIL>", 2, 0, 0),
      ("call <PHONE> or <PHONE> or <PHONE>", 0, 0, 3),
      ("short form <PHONE> still masks", 0, 0, 1)))
  }

  test("word boundaries: longer digit runs don't phone-match; dotted runs over-match as IP") {
    val out = scrub("order 1234-5678901 is 1.2.3.4.5 not pii-shaped")
    // 1234-5678901: no \d{3}-\d{4} window has boundaries on both sides.
    // 1.2.3.4.5: \b holds between '4' and '.', so the first four octets
    // DO match — the standard over-trigger of \b-based IPv4 patterns;
    // for scrubbing, erring toward masking is the right failure mode.
    assert(out.head == (("order 1234-5678901 is <IP>.5 not pii-shaped", 0, 1, 0)))
  }
}
