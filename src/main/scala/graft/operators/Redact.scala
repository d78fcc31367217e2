package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: detect and mask emails,
  * IPv4 addresses, phone-shaped number runs, and URLs. Everything is
  * `regexp_replace`/`regexp_count` — pure Catalyst, whole-stage
  * codegen, one pass per pattern over the text column; at 100 TB this
  * is a narrow map stage with no shuffle at all.
  *
  * Patterns are RE2-compatible (no lookaround, no backreferences) so
  * the same strings run under Java regex here and RE2-based engines
  * (DuckDB, Go tooling) in a cross-engine audit. They are curation
  * heuristics — recall-leaning, like CCNet/Dolma-style pipeline
  * scrubbers — not a compliance guarantee.
  *
  * The fixture corpus contains no PII (word-soup text), so this
  * operator carries no declared oracle query; RedactSpec exercises it
  * on planted documents.
  */
object Redact {

  /** (name, pattern, replacement token) — order matters: URLs first so
    * an address inside a URL is masked as the URL, not twice.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "(\\d{1,3}\\.){3}\\d{1,3}", "<IP>"),
    // 9+ digit runs allowing separators, led and ended by digits —
    // phone-shaped without claiming full E.164 coverage
    ("phone", "\\+?\\d[\\d ().-]{7,}\\d", "<PHONE>"))

  /** Text with every pattern masked by its replacement token. */
  def scrub(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, p, r) }

  /** Struct of per-pattern match counts (`n_url`, `n_email`, ...) —
    * the audit signal a curation run aggregates per source/shard to
    * find PII-dense slices before deciding to scrub or drop. Each
    * pattern counts against the text with EARLIER patterns already
    * masked (the scrub order), so overlapping shapes attribute once:
    * an IPv4 is `n_ipv4`, not also a phone-shaped digit run.
    */
  def counts(text: Column): Column = {
    val (_, cols) = patterns.foldLeft((coalesce(text, lit("")), Seq.empty[Column])) {
      case ((t, acc), (n, p, r)) =>
        (regexp_replace(t, p, r), acc :+ regexp_count(t, lit(p)).as(s"n_$n"))
    }
    struct(cols: _*)
  }
}
