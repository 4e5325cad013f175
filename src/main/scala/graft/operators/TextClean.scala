package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text cleaning and PII redaction — the normalization pass that runs
  * before dedup/quality in a training-data pipeline (markup stripping,
  * whitespace canonicalization, contact-info masking).
  *
  * Pure `regexp_replace` built-ins: narrow map stages, whole-stage
  * codegen, zero shuffles — at 100 TB these run at scan speed inside the
  * same stage as the parquet read. Every pattern is written in the
  * portable regex subset (explicit character classes, no lookaround, no
  * engine-specific escapes) that Java's regex and RE2 interpret
  * identically, so the DuckDB oracles replay them verbatim.
  */
object TextClean {

  /** markup tags: anything between angle brackets (non-greedy by class) */
  val htmlTagRe = "<[^>]*>"
  /** C0 control characters except \t \n \r (kept for the collapse pass) */
  val controlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  /** runs of whitespace to a single space */
  val whitespaceRe = "[ \\t\\r\\n]+"

  /** email addresses (conservative: requires user@host.tld shape) */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** dotted-quad IPv4 on word boundaries */
  val ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** international-format phone numbers: a leading + keeps false
    * positives out of ordinary digit runs (ids, years, quantities) */
  val phoneRe = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** strip markup, drop control characters, collapse whitespace, trim */
  def cleanCol(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, htmlTagRe, " "),
        controlRe, ""),
      whitespaceRe, " "))

  /** mask emails, IPv4 addresses, and +international phone numbers with
    * typed placeholders (email first: its domain can contain digits that
    * the later passes must not re-match) */
  def redactCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  def clean(df: DataFrame, textCol: String = "text",
      out: String = "clean_text"): DataFrame =
    df.withColumn(out, cleanCol(col(textCol)))

  def redactPii(df: DataFrame, textCol: String = "text",
      out: String = "redacted"): DataFrame =
    df.withColumn(out, redactCol(col(textCol)))
}
