package graft.extensions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for text corpora: regex redaction of email addresses and
  * phone-shaped digit runs, plus per-row match counts for audit reporting.
  *
  * The patterns are deliberately restricted to the regex subset with
  * identical semantics in Java's engine (Spark codegen) and RE2 (DuckDB,
  * Go/Rust scrubbers): character classes, bounded repetition, alternation —
  * no backreferences or lookaround — so the exact same redaction runs in
  * every engine that touches the corpus.
  *
  * Scale shape: pure per-row projections (regexp_replace / regexp_count are
  * codegen'd natives), no shuffle, no UDF — the scrub rides the scan stage
  * at 100 TB.
  */
object Scrub {

  /** Email: local part @ dotted domain with a 2+ letter TLD. */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-shaped: optional 1-2 digit country code, then NNN-NNNN. */
  val phoneRe: String = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Redact emails then phones (email first: a phone-shaped substring can
    * never appear inside an email match after it is collapsed to the tag).
    */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))

  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))

  /** Deterministic salted pseudonymization: a stable 16-hex-char token
    * `substr(md5(salt || ':' || value), 1, 16)` — the GDPR-style
    * key-tokenization that keeps JOINS working (equal inputs map to equal
    * tokens across every table tokenized with the same salt) while the
    * original identifier never leaves the boundary. Pure scan-stage
    * projection (md5 is codegen'd and engine-portable — the Splits/
    * Sampling device), zero shuffle; re-identification requires the salt.
    * 64 bits of token: birthday-collision-safe to ~10⁹ distinct keys;
    * take more hex chars beyond that.
    */
  def pseudonymize(value: Column, salt: String): Column =
    substring(md5(concat_ws(":", lit(salt), value.cast("string"))), 1, 16)
}
