package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative validation rule-sets: a (column, rule, code) list becomes
  * an exceptions DataFrame with reason codes — the engine form of the
  * reference's schema-driven frame validation (required fields, min/max
  * ranges, type/date checks — reference:
  * data_validation/validate.py::validate_dataframe_with_ge, invoked from
  * data_tyding/tidy_dynamic_tables.py).
  *
  * Scale notes: every rule is a codegen'd Column predicate evaluated in
  * ONE scan; violations stack through a single Generate (explode_outer of
  * the non-null reason structs — the plain-explode pushdown trap
  * documented at NearDup.ngramJaccardPairs applies verbatim here). No
  * per-rule jobs, no UDFs, no driver loops.
  */
object Validation {

  /** One validation rule: `violated` must be a null-safe Column predicate
    * (true ⇒ emit an exception row with `code`).
    */
  sealed trait Rule {
    def column: String
    def code: String
    def violated: Column
  }

  /** Required field (reference: optional=false). */
  final case class NotNull(column: String, code: String) extends Rule {
    def violated: Column = col(column).isNull
  }

  /** Lower bound (reference: minValue). Null values pass — pair with
    * [[NotNull]] when the field is also required.
    */
  final case class Min(column: String, bound: Double, code: String) extends Rule {
    def violated: Column = col(column).isNotNull && col(column) < bound
  }

  /** Upper bound (reference: maxValue). */
  final case class Max(column: String, bound: Double, code: String) extends Rule {
    def violated: Column = col(column).isNotNull && col(column) > bound
  }

  /** Enumerated domain (reference: value sets in the field metadata). */
  final case class InSet(column: String, values: Seq[String], code: String) extends Rule {
    def violated: Column = col(column).isNotNull && !col(column).isin(values: _*)
  }

  /** Pattern check (reference: type/format expectations). */
  final case class MatchesRegex(column: String, regex: String, code: String) extends Rule {
    def violated: Column = col(column).isNotNull && !col(column).rlike(regex)
  }

  /** Date validity under the given formats (reference:
    * date_validator.py + the profile checks in data_fix.py).
    */
  final case class DateParses(column: String, formats: Seq[String], code: String) extends Rule {
    def violated: Column = col(column).isNotNull &&
      DeriveColumns.multiFormatTimestamp(col(column), formats).isNull
  }

  /** Exceptions table: one row per (record, violated rule), columns
    * (idCols…, col_name, code, offending_value). One scan, one Generate.
    */
  def exceptions(df: DataFrame, idCols: Seq[String], rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validation needs at least one rule")
    val flagged = rules.map { r =>
      when(r.violated, struct(
        lit(r.column).as("col_name"), lit(r.code).as("code"),
        col(r.column).cast("string").as("offending_value")))
    }
    df.select(idCols.map(col) :+
        explode_outer(array(flagged: _*)).as("v"): _*)
      .filter(col("v").isNotNull)
      .select(idCols.map(col) :+ col("v.col_name").as("col_name") :+
        col("v.code").as("code") :+ col("v.offending_value").as("offending_value"): _*)
  }

  /** First violated rule's code in rule order (NULL when clean) — the
    * single-reason shape of the reference's inline validations (and of
    * q18): precedence instead of one-row-per-rule.
    */
  def firstViolation(rules: Seq[Rule]): Column =
    coalesce(rules.map(r => when(r.violated, lit(r.code))): _*)
}
