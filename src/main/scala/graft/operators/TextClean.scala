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

  // ---- C4 heuristic line filter ------------------------------------

  /** A kept line ends in terminal punctuation (`.`/`!`/`?`/closing
    * quote), carries at least `minWords` whitespace words, and does
    * not mention javascript — C4's line rules (Raffel et al. 2020
    * §2.2) in the RE2-compatible subset so the oracle applies them
    * verbatim. */
  def c4LineKeep(line: Column, minWords: Int): Column =
    line.rlike("[.!?\"]$") &&
      size(split(line, " ")) >= minWords &&
      !contains(lower(line), lit("javascript"))

  /** The C4 heuristic clean (Raffel et al. 2020 §2.2) — the OTHER
    * public-reference quality gate next to [[graft.operators
    * .QualityGate]]'s Gopher rules, operating at LINE granularity
    * where Gopher scores whole documents:
    *
    *  - keep only lines that end in terminal punctuation, have at
    *    least `minWords` words, and don't mention javascript;
    *  - drop any page containing `{` (code) or the phrase
    *    `lorem ipsum` (placeholder text);
    *  - drop pages with fewer than `minLines` surviving lines.
    *
    * Output: input columns plus `n_lines` (original), `n_kept`,
    * `keep` (the page-level verdict), and `textCol` rewritten to the
    * kept lines. ONE map-only projection — builtin higher-order
    * `filter` + `array_join`, no UDF, no shuffle, no state — so the
    * same call gates a structured stream at ingest, and at 100 TB the
    * cost is the text scan itself. Dropping the failed pages is
    * `.filter(col("keep"))` — left to the caller so accounting stays
    * observable (same contract as [[QualityGate]]). */
  def c4Filter(docs: DataFrame, textCol: String, minWords: Int = 3,
      minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => c4LineKeep(l, minWords))
    docs
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("keep",
        !contains(col(textCol), lit("{")) &&
        !contains(lower(col(textCol)), lit("lorem ipsum")) &&
        size(kept) >= minLines)
      .withColumn(textCol, array_join(kept, "\n"))
  }
}
