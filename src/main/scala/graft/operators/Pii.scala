package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F9: PII detection and redaction — the compliance pass every
  * production training-data pipeline runs before text leaves the
  * curation boundary (emails, phone numbers, IP addresses, SSN-shaped
  * ids). Reference has no counterpart (its payloads are graph
  * properties); this is part of the LLM-pipeline surface the brief
  * makes first-class.
  *
  * Design stance:
  *  - Pure per-row projection — `regexp_extract_all` / chained
  *    `regexp_replace` are codegen'd string expressions: no shuffle,
  *    no UDF, scales embarrassingly at any corpus size.
  *  - Patterns are deliberately restricted to the regex subset where
  *    Java's backtracking engine and RE2-family engines (DuckDB — the
  *    oracle; also Go/Rust scanners a pipeline might pair with) agree
  *    on every match: character classes, bounded/greedy quantifiers,
  *    `\b` anchors; no lookaround, no backreferences. That keeps one
  *    pattern set auditable across the whole toolchain.
  *  - Redaction replaces with angle-bracket tokens (`<EMAIL>` …) that
  *    contain no digits or `@`/`.` runs, so one rule's output can
  *    never re-trigger another rule, making the scrub order-stable
  *    past the one documented constraint (IP before phone).
  */
object Pii {

  /** user@host.tld — local part per RFC-practical subset. */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4 dotted quad. Scrub BEFORE [[Phone]]: a quad like
    * 192.168.10.1 is also 8+ digits-and-dots and would otherwise be
    * eaten as a phone number. */
  val Ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** SSN-shaped id: 3-2-4 digit groups. */
  val IdNum = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Phone-shaped run: optional +, then >= 8 chars of digits with
    * (), -, . separators, digit-bounded. Deliberately excludes
    * whitespace separators — a space-tolerant pattern swallows
    * adjacent independent numbers ("room 12 floor 34"…), trading
    * recall on spaced formats for precision; tune per corpus. */
  val Phone = "\\+?\\d[\\d().-]{6,}\\d"

  /** Detection counts per row (on the ORIGINAL text, each pattern
    * independently — counts are diagnostics, overlap is fine). */
  def flag(df: DataFrame, textCol: String): DataFrame = {
    // group 0 = the whole match (patterns are group-free; Spark's
    // default idx of 1 would reject them, DuckDB's default is 0)
    def hits(p: String) = size(regexp_extract_all(col(textCol), lit(p), lit(0)))
    df.withColumn("n_emails", hits(Email))
      .withColumn("n_ips", hits(Ipv4))
      .withColumn("n_ids", hits(IdNum))
      .withColumn("n_phones", hits(Phone))
  }

  /** Redacted text: email → ip → id → phone (ip/id before phone —
    * both are digit runs a phone pattern could claim; email first is
    * cosmetic since its replacement can't re-match). */
  def scrub(text: Column): Column = {
    val e = regexp_replace(text, Email, "<EMAIL>")
    val i = regexp_replace(e, Ipv4, "<IP>")
    val d = regexp_replace(i, IdNum, "<ID>")
    regexp_replace(d, Phone, "<PHONE>")
  }

  /** flag + scrub fused; `scrubbed` replaces nothing in place —
    * callers choose which column to keep downstream.
    *
    * r10: routed through the native [[graft.functions.PiiRedact]]
    * expression — one conversion + at most 3 matcher passes per row
    * (usually 0, via the '@'/digit class screens) instead of the
    * 8-regex chain, with IDENTICAL output (PiiSpec pins the fused
    * expression against [[redactChained]] row-for-row, including the
    * boundary-creation corner where scrubbing an email CREATES a
    * later ip match). 45 s → see BASELINE.md at the 100× pack. */
  def redact(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.{GraftExpressionBridge => B}
    val r = B.column(graft.functions.PiiRedact(
      B.expression(df(textCol))))
    df.withColumn("__pii", r)
      .withColumn("n_emails", col("__pii.n_emails"))
      .withColumn("n_ips", col("__pii.n_ips"))
      .withColumn("n_ids", col("__pii.n_ids"))
      .withColumn("n_phones", col("__pii.n_phones"))
      .withColumn("scrubbed", col("__pii.scrubbed"))
      .drop("__pii")
  }

  /** The original 8-expression chain (4 extract_all counts + 4
    * chained replaces) — the differential-spec reference for
    * [[redact]] and the shape the DuckDB oracle mirrors 1:1. */
  def redactChained(df: DataFrame, textCol: String): DataFrame =
    flag(df, textCol).withColumn("scrubbed", scrub(col(textCol)))
}
