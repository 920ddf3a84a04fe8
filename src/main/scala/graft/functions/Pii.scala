package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass
  * a training-data pipeline runs before anything leaves the corpus:
  * count and mask emails, IPv4 addresses, and long digit runs
  * (account/card-shaped numbers).
  *
  * Everything is built from `regexp_extract_all` / `regexp_replace`
  * Columns — codegen'd, narrow, no UDF — so the scan stays inside
  * whole-stage codegen and runs at parquet-scan speed on 100 TB.
  *
  * The patterns deliberately stay inside the Java-regex ∩ RE2 common
  * subset (explicit character classes, no shorthand like \\d or \\s,
  * no backreferences) so an engine-independent oracle can replay them
  * verbatim; replacement order is fixed (emails → IPs → digit runs)
  * because the classes can overlap textually.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
  val LongDigitsRe = "[0-9]{12,}"

  def emailCount(c: Column): Column = size(regexp_extract_all(c, lit(EmailRe), lit(0))).cast("long")
  def ipv4Count(c: Column): Column = size(regexp_extract_all(c, lit(Ipv4Re), lit(0))).cast("long")
  def longDigitsCount(c: Column): Column = size(regexp_extract_all(c, lit(LongDigitsRe), lit(0))).cast("long")

  /** Mask all three classes, in the fixed order emails → IPv4 → digit
    * runs (an email's host can contain digit runs; an IP is itself a
    * digit-and-dot run — the order makes the result well-defined).
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(LongDigitsRe), lit("<NUM>"))
}
