package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over a text column — a standard curation
  * pass before corpus release/training. Pure projection work (regex
  * count + replace chains), embarrassingly parallel, no shuffle at any
  * scale.
  *
  * Pattern discipline: each pattern uses only character classes and
  * greedy counted quantifiers — no alternations whose branches prefix
  * each other — so Java's leftmost-first backtracking engine (Spark) and
  * RE2's leftmost-longest automaton (the DuckDB oracle) select the
  * IDENTICAL match spans, and redacted output is bit-identical across
  * engines.
  *
  * Order matters and is part of the contract: emails are counted and
  * redacted FIRST (an address local-part like `a+15551234567b@x.com`
  * contains a phone-shaped substring; counting phones before the email
  * redact would double-count it), then IPv4, then phone numbers — each
  * stage counts on the PREVIOUS stage's output.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9]{7,15}"

  private def nMatches(t: Column, pat: String): Column =
    size(regexp_extract_all(t, lit(pat), lit(0))).cast("long")

  /** id, redacted text, and per-category match counts. */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    val t3 = regexp_replace(t2, PhonePattern, "<PHONE>")
    df.select(
      col(idCol).as("id"),
      t3.as("redacted"),
      nMatches(t0, EmailPattern).as("n_emails"),
      nMatches(t1, Ipv4Pattern).as("n_ipv4"),
      nMatches(t2, PhonePattern).as("n_phones"))
  }
}
