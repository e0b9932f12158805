package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the anonymization pass every public-web training
  * corpus runs before release (C4's and Dolma's email/phone/IP masking):
  * detect and replace personal identifiers with typed placeholder
  * tokens, keeping surrounding text intact so the document stays
  * trainable.
  *
  * Pure codegen'd `regexp_replace`/`regexp_extract_all` projections — no
  * UDF, no shuffle; at 100 TB this runs inside the scan's codegen span
  * like the cleanup pack. The patterns are deliberately written in the
  * common subset of Java regex (Spark) and RE2 (DuckDB) — character
  * classes, bounded repeats, `\b` — so the oracle replays them verbatim;
  * fancier lookaround-based patterns would silently diverge between
  * engines. Scrub order matters and is fixed: emails first (their local
  * part may contain digits and dots that the narrower patterns would
  * chew on), then IPs (dotted digits), then phones. Phone coverage is
  * deliberately NANP-shaped (`ddd-ddd-dddd` with `-`/`.`/space
  * separators, plus the bare 7-digit local form); international
  * `+cc`-prefixed forms are out of scope here and handled by
  * [[Text.PhonePattern]]'s redaction pass.
  */
object Pii {

  /** Shared engine-portable patterns (Java regex ∩ RE2). The email
    * pattern is case-insensitive via the inline `(?i)` flag (supported
    * identically by both engines) — `John.Doe@Example.COM` must mask.
    * The phone pattern covers the North-American full form with `-`,
    * `.`, or space separators plus the bare 7-digit `ddd-dddd` local
    * form; longest alternative first so `555-123-4567` masks whole,
    * not as a partial `123-4567`. */
  val EmailPattern = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b|\\b\\d{3}-\\d{4}\\b"

  def countEmails(c: Column): Column = size(regexp_extract_all(c, lit(EmailPattern), lit(0)))
  def countIps(c: Column): Column = size(regexp_extract_all(c, lit(Ipv4Pattern), lit(0)))
  def countPhones(c: Column): Column = size(regexp_extract_all(c, lit(PhonePattern), lit(0)))

  /** All three identifier classes replaced by typed placeholders. */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")
}
