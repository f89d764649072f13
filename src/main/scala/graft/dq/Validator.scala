package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** A single data-quality rule: a Column expression that yields an error
  * message (String) for failing rows and NULL for passing rows.
  *
  * Mirrors the reference's validation algebra
  * (glue_jobs/01_silver_delta_upsert.py:48-74): each rule is a two-stage
  * `when` chain (NULL check, then a pattern/domain check), and all rules are
  * folded with a null-skipping `concat_ws(" | ", ...)`.
  */
final case class Rule(name: String, failure: Column)

object Rule {

  /** NOT-NULL + regex rule (reference 01:52-69). Note the regex runs on the
    * column *as cast to string*, so an INT column with a negative value fails
    * `^[0-9]+$` (quirk Q1 in SURVEY.md §2.3).
    */
  def notNullMatching(colName: String, pattern: String, nullMsg: String, badMsg: String): Rule =
    Rule(colName, when(col(colName).isNull, nullMsg).when(!col(colName).rlike(pattern), badMsg))

  /** NOT-NULL + case-insensitive domain rule (reference 01:72-73). */
  def notNullInDomainCI(colName: String, domain: Seq[String], nullMsg: String, badMsg: String): Rule =
    Rule(colName, when(col(colName).isNull, nullMsg).when(!upper(col(colName)).isin(domain: _*), badMsg))
}

/** Declarative validator: folds rules into a single `Reject_reason` column
  * and splits a frame into (valid, invalid). Pure Column algebra — fully
  * whole-stage-codegen-able, no UDFs (SURVEY.md §2.11).
  */
final class Validator(rules: Seq[Rule], rejectCol: String = "Reject_reason") {

  /** `concat_ws` skips NULLs, so fully-clean rows produce "" which is mapped
    * to NULL (reference 01:50,77-78). Multi-failure rows get " | "-joined
    * messages in rule declaration order (quirk Q3).
    */
  def rejectReason: Column = {
    val all = concat_ws(" | ", rules.map(_.failure): _*)
    when(all === "", lit(null).cast(StringType)).otherwise(all)
  }

  def validate(df: DataFrame): DataFrame = df.withColumn(rejectCol, rejectReason)

  /** Split into (valid, invalid). The parent is NOT cached here — callers
    * that evaluate both branches should cache `validate(df)` themselves
    * (the reference re-scans the CSV; we fix that in the pipeline layer,
    * SURVEY.md §4 last row).
    */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val v = validate(df)
    (v.filter(col(rejectCol).isNull), v.filter(col(rejectCol).isNotNull))
  }
}
