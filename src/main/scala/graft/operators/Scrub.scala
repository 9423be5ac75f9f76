package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / pattern scrubbing for training-data pipelines (the redaction pass
  * CCNet/Dolma-style curation runs before anything else sees the text):
  * each (regex, replacement) rule is applied in order with a per-row
  * redaction count, so downstream stages can both consume the cleaned text
  * and monitor redaction-rate drift per source.
  *
  * Pure per-row map — codegen regexp_replace/regexp_count, no shuffle, no
  * UDF — so it runs at scan speed and composes with any partitioning.
  * Counts are per-rule-match BEFORE redaction; overlapping rules each count
  * their own matches (documented: the count is a monitoring signal, not an
  * exact PII census).
  */
object Scrub {

  /** (pattern, replacement) rules. Patterns stick to syntax shared by Java
    * regex and RE2-style engines (no backrefs, no lookarounds) so oracle
    * SQL and cross-engine consumers re-derive them exactly.
    */
  val email: (String, String) = ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
  val phone: (String, String) = ("\\+?[0-9][0-9() .-]{7,}[0-9]", "[PHONE]")
  val digitRun: (String, String) = ("[0-9]{2,}", "[NUM]")

  /** Append `<colName>_redacted` (all rules applied in order) and
    * `n_redactions` (total matches across rules, counted on the original).
    */
  def redact(df: DataFrame, colName: String,
      rules: Seq[(String, String)] = Seq(email, phone, digitRun)): DataFrame = {
    val redacted = rules.foldLeft(col(colName)) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    val nRed: Column = rules.map { case (pat, _) => regexp_count(col(colName), lit(pat)) }
      .reduce(_ + _)
    df.withColumn(s"${colName}_redacted", redacted)
      .withColumn("n_redactions", nRed)
  }
}
