package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrub step every
  * training-data pipeline runs before a corpus ships. Pure codegen'd
  * `regexp_extract_all` / `regexp_replace` column expressions (no UDFs):
  * row-local, zero shuffles, whole-stage-codegen friendly, and the regex
  * dialect is the RE2-compatible subset (no backreferences, no lookaround)
  * so the DuckDB oracle replicates matches exactly.
  *
  * Four detector classes cover the common structured-PII shapes: email
  * addresses, North-American phone numbers, IPv4 addresses, and SSN-shaped
  * ids. Redaction replaces each match with a bracketed class token so
  * downstream tokenizers see a stable, digit-free placeholder.
  */
object Pii {

  /** (class name, RE2-compatible pattern, redaction token). Order matters
    * for [[redact]]: email first (its local part may contain digits that
    * phone/ssn patterns could nibble), then the digit shapes longest-first;
    * every token is digit-free so one pass cannot re-trigger another. */
  val detectors: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    ("phone", "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b", "[PHONE]"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]"))

  /** Count of matches of one detector class in `text`. */
  def countMatches(text: Column, clazz: String): Column = {
    val p = detectors.collectFirst { case (n, pat, _) if n == clazz => pat }
      .getOrElse(throw new IllegalArgumentException(s"unknown PII class: $clazz"))
    size(regexp_extract_all(text, lit(p), lit(0)))
  }

  /** True when any detector class matches. */
  def hasPii(text: Column): Column =
    detectors.map { case (_, p, _) => text.rlike(p) }.reduce(_ || _)

  /** `text` with every detected span replaced by its class token. */
  def redact(text: Column): Column =
    detectors.foldLeft(text) { case (c, (_, p, tok)) =>
      regexp_replace(c, p, java.util.regex.Matcher.quoteReplacement(tok))
    }
}
