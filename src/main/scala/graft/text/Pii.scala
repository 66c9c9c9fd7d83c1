package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection/redaction for training-corpus scrubbing (north-star
 * extension beyond the reference surface — SURVEY.md §2.7 family).
 *
 * Pure per-row regexp projections: shuffle-free, codegen'd (Spark's
 * `RegExpReplace`/`RegExpCount` are native Catalyst expressions — the
 * pattern compiles once per task, not per row). At 100 TB this runs at
 * scan speed; there is no aggregation, no join, no state.
 *
 * Pattern dialect note: every pattern below stays inside the common
 * subset of java.util.regex and RE2 (no lookaround, no backreferences),
 * so the exact same pattern string is valid — and matches the same
 * spans — in Spark, DuckDB, Go, and the usual data-pipeline tooling.
 * That is what makes the redaction reproducible across engines (the
 * oracle gate runs these patterns in DuckDB verbatim).
 */
object Pii {

  /** The common-subset patterns. Deliberately precision-leaning: a
    * corpus scrub that eats every number does more harm than a missed
    * exotic phone format; recall-hungry callers can pass their own
    * pattern set to [[redactAll]]. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b"

  /** (pattern, replacement) in application order. Email runs FIRST:
    * its local part may contain digits/dots that the IP pattern would
    * otherwise carve up, leaving an unredactable half-address. */
  val DefaultRules: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    Ipv4Pattern -> "<IP>",
    PhonePattern -> "<PHONE>")

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, "<EMAIL>")

  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, "<IP>")

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhonePattern, "<PHONE>")

  /** Apply a rule chain in order (default: email → IPv4 → phone).
    * Idempotent for the default rules: the replacement tokens contain
    * no digits or @, so a second pass finds nothing.
    *
    * The DEFAULT chain runs as one native kernel
    * ([[org.apache.spark.sql.graftbridge.PiiRedact]] — three hand-rolled
    * leftmost matchers reproducing the regex spans byte-for-byte; the
    * three regexp_replace engine passes measured ~9 s at 500k docs,
    * span-pinned against [[redactAllRegex]] in TextOpsSpec and the
    * PII-adversarial fuzz corpus). Custom rule sets keep the generic
    * regexp_replace fold. */
  def redactAll(text: Column, rules: Seq[(String, String)] = DefaultRules): Column =
    if (rules == DefaultRules) {
      import org.apache.spark.sql.graftbridge.{ColumnBridge, PiiRedact}
      ColumnBridge.column(PiiRedact(ColumnBridge.expression(text)))
    } else redactAllRegex(text, rules)

  /** The regexp_replace formulation of [[redactAll]] — the engine-portable
    * reference (the oracle SQL chains the same three patterns). */
  def redactAllRegex(text: Column, rules: Seq[(String, String)] = DefaultRules): Column =
    rules.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** Per-kind match counts over the ORIGINAL text — the audit column a
    * scrub pipeline keeps next to the redacted output (how much PII did
    * this source carry?). Same engine-portable patterns.
    *
    * Counting contract: counts are RAW per-pattern matches, each pattern
    * scanned independently over the original text — a span matching two
    * patterns (e.g. `10.0.0.1@example.com`) increments BOTH counters,
    * while [[redactAll]]'s ordered chain emits only the first rule's
    * token. So `n_email + n_ip + n_phone` can exceed the number of
    * replacement tokens in the redacted text; the counts answer "how
    * much of each KIND did the source carry", not "how many tokens did
    * redaction write". (Counting on the progressively-redacted text
    * would tie the audit to one specific rule order and lose the
    * per-kind signal for overlapping spans.) */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailPattern)),
     regexp_count(text, lit(Ipv4Pattern)),
     regexp_count(text, lit(PhonePattern)))

  /** All three audit counts in ONE native scan of the original text
    * ([[org.apache.spark.sql.graftbridge.PiiMatchCounts]]) — array slots
    * [email, ip, phone], count-pinned against [[piiCounts]]. Callers
    * should alias the array once and extract fields in a FOLLOW-UP
    * projection (a non-cheap alias referenced ≥2× survives
    * CollapseProject, so the kernel runs once per row; naive per-field
    * copies of the expression would scan three times). */
  def piiCountsArray(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, PiiMatchCounts}
    ColumnBridge.column(PiiMatchCounts(ColumnBridge.expression(text)))
  }
}
