package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass a
  * training-data pipeline runs before anything else sees the corpus.
  * Extension surface (the reference engine has no text functions at
  * all, SURVEY.md §2.7).
  *
  * Everything here is built on Spark's codegen'd regexp builtins — the
  * scan stage does all the work, no shuffle, no UDF. The patterns are
  * deliberately engine-portable: no lookarounds, no shorthand classes
  * (`\d`, `\w`) whose definitions differ between regex engines — only
  * explicit character classes and bounded repetition, so Java regex
  * (Spark) and RE2 (DuckDB, the correctness oracle) match the same
  * spans.
  *
  * Redaction order is load-bearing: emails first (an email like
  * `user@mail10.0.0.8.com` contains an IPv4-shaped span the IP pass
  * would otherwise split mid-address), then IPs, then phones. Both
  * engines apply the same order, so the composition is deterministic.
  */
object PiiFunctions {

  val EmailPattern: String =
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
  val Ipv4Pattern: String =
    "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern: String =
    "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern))
  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(Ipv4Pattern))
  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePattern))

  /** All three classes masked, email → IP → phone. */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }
}
