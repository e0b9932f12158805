package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-style corpora — the step every web
  * pipeline runs BEFORE content dedup, because the same page is fetched
  * under dozens of raw spellings (tracking params, default ports, case,
  * trailing slashes, fragments). Collapsing those here turns a
  * content-hash dedup problem into a cheap string group-by and shrinks
  * the fetch frontier itself.
  *
  * Everything is built from codegen'd built-ins (`try_parse_url`,
  * `regexp_*`, array higher-order functions) — a narrow projection, no
  * UDF, no shuffle. At 100 TB this runs inside the scan's
  * WholeStageCodegen span; the only exchange in the dedup query is the
  * final group-by on the canonical key, which map-side combines.
  *
  * Canonical form (one deliberate, documented choice per rule):
  *  - scheme and host lowercased (case-insensitive per RFC 3986 §6.2.2.1);
  *    path/query case preserved (case-sensitive on most origins)
  *  - default ports dropped (443 for https, 80 for http); other ports kept
  *  - fragment dropped (never sent to the server)
  *  - trailing slashes stripped from the path ("/a/" == "/a"; root -> "")
  *  - tracking params removed: any `utm_*` key plus the explicit
  *    [[Urls.TrackingKeys]] set
  *  - remaining query params sorted lexicographically (order-insensitive
  *    serving is the common case; opt out by skipping canonicalize)
  *  - userinfo (`user@host`) dropped with the rest of the authority
  *    decoration: it never identifies a different PAGE, and keeping
  *    credentials in a dedup key would leak them into every downstream
  *    artifact
  */
object Urls {

  /** Non-utm tracking keys stripped by [[canonicalize]] (utm_* is matched
    * by prefix). A production deployment would extend this list; the
    * mechanism is the point. */
  val TrackingKeys: Seq[String] = Seq("ref", "fbclid", "gclid", "mc_cid", "mc_eid")

  /** Demo subset of the Mozilla Public Suffix List's multi-label
    * suffixes. Production would load the full PSL as a broadcast lookup;
    * the two-vs-three-label decision logic below is unchanged by the
    * list's size. */
  val MultiLabelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br")

  private def isTracking(p: Column): Column = {
    val key = split(p, "=").getItem(0)
    key.startsWith("utm_") || key.isin(TrackingKeys: _*)
  }

  /** Canonical spelling of an absolute http(s) URL (see object doc for
    * the rule set). Null-safe: a malformed URL (parse_url -> null host)
    * yields null rather than a half-canonical string. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(try_parse_url(url, lit("PROTOCOL")))
    val host = lower(try_parse_url(url, lit("HOST")))
    val port = regexp_extract(try_parse_url(url, lit("AUTHORITY")), ":(\\d+)$", 1)
    val defaultPort = when(scheme === "https", "443")
      .when(scheme === "http", "80").otherwise("")
    val keptPort = when(port === "" || port === defaultPort, "")
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(coalesce(try_parse_url(url, lit("PATH")), lit("")), "/+$", "")
    val rawQuery = try_parse_url(url, lit("QUERY"))
    // empty segments (a trailing '&', a lone '?', 'a=1&&b=2') are dropped
    // too: '?x' vs '?x&' must not produce different canonical spellings
    val keptParams = array_sort(
      filter(split(rawQuery, "&"), p => p =!= "" && !isTracking(p)))
    val query = when(rawQuery.isNull || size(keptParams) === 0, "")
      .otherwise(concat(lit("?"), array_join(keptParams, "&")))
    when(scheme.isNull || host.isNull, lit(null))
      .otherwise(concat(scheme, lit("://"), host, keptPort, path, query))
  }

  /** Dedup key: [[canonicalize]] plus a leading-`www.` strip — "www.x.com"
    * and "x.com" almost always serve the same page, so the DEDUP key
    * unifies them while the canonical URL (which a refetch would use)
    * keeps the spelling the site chose. The lookahead requires at least
    * two labels AFTER the strip: for the (real) host "www.com", www IS
    * the registrable label and stripping it would alias the site onto a
    * different origin. */
  def dedupKey(url: Column): Column =
    regexp_replace(canonicalize(url), "^(https?://)www\\.(?=[^/]*\\.)", "$1")

  /** Registered domain (eTLD+1) of an already-lowercased host: the unit
    * crawl pipelines budget, rate-limit, and report by. Last two labels,
    * or three when the last two are a multi-label public suffix
    * ([[MultiLabelSuffixes]]); a bare two-label host is its own
    * registered domain. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(size(labels) <= 2, host)
      .when(last2.isin(MultiLabelSuffixes: _*), last3)
      .otherwise(last2)
  }
}
