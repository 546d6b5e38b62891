package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the scrub pass a training-data pipeline runs before
  * anything else sees the text (emails, phone numbers, IPs, SSN/card
  * digit runs are compliance liabilities AND memorization hazards).
  * Reference behavior: TopN-ClashRoyal-ETL-SQL-snapshot carries no free
  * text; this is the engine's training-data extension surface
  * (SURVEY.md §2.12).
  *
  * Design constraints that shape the rules:
  *   - Patterns are REGEX-DIALECT-PORTABLE: no lookaround, no
  *     backreferences, ASCII character classes only — the subset where
  *     Java regex (Spark) and RE2 (DuckDB/the oracle) agree token for
  *     token, so the redacted corpus hash-checks across engines.
  *   - Rules apply in a FIXED order (most-specific first: SSN before
  *     phone — both contain 3-digit runs; email before bare domains is
  *     moot here but the ordering contract is the point): redaction is a
  *     fold, and fold order is part of the operator's semantics.
  *   - Replacement tokens are angle-bracket tags (`<EMAIL>`…), the
  *     common convention, and cannot themselves match any rule (no
  *     digits/@ inside), so the fold is idempotent.
  *
  * Scale shape: a pure per-row projection — regexp_replace chains fuse
  * into the scan with whole-stage codegen, zero shuffles, zero joins;
  * at 100 TB this is embarrassingly parallel and I/O-bound, exactly
  * what a scrub pass should be. Counting uses regexp_extract_all on the
  * PRE-redaction text (size of the match list), also scan-fused.
  */
object Redaction {

  /** Ordered (tag, pattern) rules — most specific first. */
  val piiRules: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "SSN" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "CARD" -> "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b",
    "PHONE" -> "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b",
    "IP" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** The redacted text: `rules` applied as an ordered regexp_replace
    * fold, each match replaced by its `<TAG>`. */
  def scrub(text: Column,
      rules: Seq[(String, String)] = piiRules): Column =
    rules.foldLeft(text) { case (acc, (tag, pat)) =>
      regexp_replace(acc, pat, s"<$tag>")
    }

  /** Per-row scrub + accounting: the input with `text` replaced by its
    * redacted form plus one `n_<tag>` count column per rule (matches
    * found in the ORIGINAL text — counts are measured before earlier
    * rules consume overlapping spans, so each column answers "how many
    * of these did the raw text contain"). */
  def scrubWithCounts(df: DataFrame, text: Column,
      rules: Seq[(String, String)] = piiRules): DataFrame = {
    val counted = rules.foldLeft(df.withColumn("__raw", text)) {
      case (acc, (tag, pat)) =>
        acc.withColumn(s"n_${tag.toLowerCase}",
          size(regexp_extract_all(col("__raw"), lit(pat), lit(0))).cast("long"))
    }
    counted.withColumn("text", scrub(col("__raw"), rules)).drop("__raw")
  }
}
