package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for pre-training corpora — the redaction pass every
  * public web-scale pipeline runs before training (C4 strips lines by
  * pattern; RefinedWeb/FineWeb substitute placeholder tokens for
  * emails, phone numbers, and IPs so downstream dedup and training
  * never see raw identifiers).
  *
  * All four detectors are single regexes applied with Spark's builtin
  * `regexp_replace` / `regexp_extract_all` — codegen'd expressions, so
  * the scrub rides the scan like every other kernel (no UDF, no
  * barrier, filters push through). The patterns stay inside the
  * RE2-compatible subset (character classes, bounded repetition, `\b`)
  * so an external SQL engine applies the SAME patterns verbatim — that
  * is what the DuckDB oracle does.
  *
  * Order matters and is fixed: email → phone → nnn-nn-nnnn ids → IPv4.
  * Emails go first so digit runs inside addresses can never be claimed
  * by the narrower numeric detectors; the id pattern cannot fire
  * inside an un-redacted phone (3-3-4 grouping never contains a 3-2-4
  * match — boundary-checked in TextCleanSpec).
  */
object TextClean {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** International-prefix phone in grouped form, e.g. +1-555-123-4567. */
  val PhonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  /** nnn-nn-nnnn government-id shape (US SSN grouping). */
  val IdPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val IpPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IdToken = "<ID>"
  val IpToken = "<IP>"

  /** Count matches of one detector in `text` (pre-redaction). */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** The redaction chain on a single column, fixed order. */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, EmailToken)
    val p = regexp_replace(e, PhonePattern, PhoneToken)
    val i = regexp_replace(p, IdPattern, IdToken)
    regexp_replace(i, IpPattern, IpToken)
  }

  /** Scrub `textCol` in place and account per category: output = input
    * columns with `textCol` redacted, plus `n_email`, `n_phone`,
    * `n_id`, `n_ip` match counts (counted on the ORIGINAL text, so the
    * accounting is independent of the replacement order). One
    * projection — no shuffle, no UDF; at 100 TB this is a map-only
    * stage whose cost is the regex scan itself. */
  def redactPii(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_email", countMatches(col(textCol), EmailPattern))
      .withColumn("n_phone", countMatches(col(textCol), PhonePattern))
      .withColumn("n_id", countMatches(col(textCol), IdPattern))
      .withColumn("n_ip", countMatches(col(textCol), IpPattern))
      .withColumn(textCol, redact(col(textCol)))
}
