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

  /** Fallback group key for records whose URL fails to parse (null
    * [[dedupKey]]): a per-record sentinel so they survive URL dedup as
    * singletons. ONE definition shared by the batch
    * ([[graft.pipelines.CorpusPipeline.urlDedup]]) and streaming
    * ([[graft.streaming.Streaming.urlDedupStream]]) paths so their group
    * keys can never diverge. Collision-free by construction: every
    * canonical key starts with "http", never with a space. */
  def fallbackKey(id: Column): Column =
    concat(lit(" id:"), id.cast(org.apache.spark.sql.types.StringType))

  /** True when `host` has no registrable part — it IS a public suffix
    * under the [[Psl]] rules. */
  private def isBareSuffix(host: Column): Column =
    Psl.isPublicSuffix(host)

  /** Dedup key: [[canonicalize]] plus a leading-`www.` strip — "www.x.com"
    * and "x.com" almost always serve the same page, so the DEDUP key
    * unifies them while the canonical URL (which a refetch would use)
    * keeps the spelling the site chose. The strip is guarded three ways
    * against origin aliasing, where `www` is (part of) the registrable
    * label rather than decoration:
    *  - the regex lookahead requires at least two labels AFTER the strip
    *    (for the real host "www.com", www IS the registrable label);
    *  - the strip is skipped when the POST-strip host is itself a public
    *    suffix ("www.co.uk" must not collapse onto the bare suffix
    *    "co.uk" — a different origin shared by every .co.uk registrant);
    *  - and when the PRE-strip host is itself a public suffix (under a
    *    wildcard rule like `*.kawasaki.jp`, "www.kawasaki.jp" is a whole
    *    public zone, not a decorated spelling of "kawasaki.jp"). */
  def dedupKey(url: Column): Column = {
    // the strip decision needs only the HOST (cheap to re-parse), not the
    // canonical string — keeping the big canonicalize subtree out of the
    // guard halves this expression's serialized size, which matters
    // because the optimizer inlines dedupKey into several plan nodes of
    // every URL-dedup stage
    val host = lower(try_parse_url(url, lit("HOST")))
    val tail = regexp_replace(host, "^www\\.", "")
    val strip = host.startsWith("www.") && tail.contains(".") &&
      !isBareSuffix(tail) && !isBareSuffix(host)
    val c = canonicalize(url)
    when(strip, regexp_replace(c, "^(https?://)www\\.", "$1")).otherwise(c)
  }

  /** Registered domain (eTLD+1) of an already-lowercased host: the unit
    * crawl pipelines budget, rate-limit, and report by. Delegates to the
    * full [[Psl]] rule sets (longest match, wildcard and exception rules;
    * null when the host IS a public suffix — including single-label
    * hosts, which have no registrable part under the default rule).
    * [[Psl.rules]] fails loudly at classload if the committed resource
    * is missing, so there is no silent demo fallback to diverge from. */
  def registeredDomain(host: Column): Column =
    Psl.registeredDomain(host)
}
