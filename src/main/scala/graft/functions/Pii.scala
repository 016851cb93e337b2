package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed PII detection and redaction — the privacy-scrubbing pass a
  * training-data pipeline runs before anything ships (emails, phone
  * numbers, IPv4 addresses, SSN-shaped ids). The reference has no PII
  * surface (its corpus is tabular trip data); this extends the engine's
  * text-cleaning ladder (generic `tx_redact` digit/long-token masking)
  * with per-kind detection, typed placeholders, and density audits.
  *
  * Every pattern stays in the Java-regex ∩ RE2 subset (character
  * classes, bounded repetition, `\b` word boundaries — no lookaround,
  * no backreferences) so the DuckDB oracle runs the IDENTICAL pattern
  * strings and the redacted text hash-matches byte-for-byte.
  *
  * Scale shape: detection and redaction are pure codegen'd Column
  * expressions — one scan, map-only, no UDFs, no shuffle. At 100 TB the
  * pass is embarrassingly parallel and pipelines into whatever scan
  * feeds it.
  */
object Pii {

  /** (kind, pattern, placeholder) in REDACTION ORDER. Email first: its
    * local part may contain digits that the narrower numeric shapes
    * must not see as their own match. The numeric shapes are mutually
    * non-overlapping by construction (distinct group widths, `\b`
    * anchored), so their relative order is fixed only for determinism.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  def patternOf(kind: String): String =
    patterns.find(_._1 == kind)
      .getOrElse(throw new IllegalArgumentException(s"unknown PII kind $kind"))
      ._2

  /** Occurrences of one PII kind in `text` (codegen'd regexp_count). */
  def countCol(kind: String, text: Column): Column =
    regexp_count(text, lit(patternOf(kind)))

  /** Total PII occurrences of every kind. */
  def totalCol(text: Column): Column =
    patterns.map { case (k, _, _) => countCol(k, text) }
      .reduce(_ + _)

  /** `text` with every PII match replaced by its kind's placeholder,
    * applied in [[patterns]] order. Placeholders contain no digits or
    * `@`, so redaction is idempotent: redactAll(redactAll(t)) ==
    * redactAll(t).
    */
  def redactAll(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, p, ph)) => regexp_replace(c, p, ph) }

  /** Register `pii_redact(text)` for spark.sql texts — the scrub is then
    * available to the verbatim-SQL surface like the native vector/sketch
    * functions.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
    // catalyst expressions directly, NOT the Column API: a Column built
    // from functions.* is an unresolved ColumnNode in Spark 4, and the
    // registry expects a resolvable Expression tree
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pii_redact",
      exprs => patterns.foldLeft(exprs(0)) { case (e, (_, p, ph)) =>
        RegExpReplace(e, Literal(p), Literal(ph))
      },
      "built-in")
  }
}
