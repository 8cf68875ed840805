package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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
    * [[NotNull]] when the field is also required. The comparison goes
    * through `try_cast` so a non-numeric STRING value doesn't fire (or
    * throw under ANSI mode) — format violations are the regex rules'
    * business, the same convert-then-check split as the reference.
    */
  final case class Min(column: String, bound: Double, code: String) extends Rule {
    def violated: Column = {
      val v = col(column).try_cast(DoubleType)
      // !isnan: a stringified 'NaN' would otherwise compare GREATER than
      // any bound (SQL NaN ordering) and fire Max spuriously — NaN is
      // format garbage, not an out-of-range measurement
      v.isNotNull && !isnan(v) && v < bound
    }
  }

  /** Upper bound (reference: maxValue). */
  final case class Max(column: String, bound: Double, code: String) extends Rule {
    def violated: Column = {
      val v = col(column).try_cast(DoubleType)
      v.isNotNull && !isnan(v) && v > bound
    }
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

  /** Required-field check with the reference's missing-value sentinels:
    * pandas stringification leaves 'nan'/'None'/'NaT'… artifacts that the
    * reference scrubs to NaN before its not-null expectation
    * (validate.py::_validate_subset, the `.replace([...], '')` chain).
    */
  final case class RequiredPresent(column: String, code: String) extends Rule {
    def violated: Column = col(column).isNull ||
      trim(col(column)).isin(RequiredPresent.missingSentinels: _*)
  }
  object RequiredPresent {
    val missingSentinels: Seq[String] = Seq("", "nan", "<NA>", "None", "null", "NAT", "NaT")
  }

  /** Value→label pair check: when a coded value has an expected display
    * label in the field's options, the row's label must match it
    * case-insensitively (reference: validate.py:575-610 — the per-row
    * value/label mismatch scan over field options). Values without a
    * mapping, and blank values, pass. The mapping is a plan literal —
    * no join.
    */
  final case class LabelMatchesOption(column: String, labelColumn: String,
      mapping: Map[String, String], code: String) extends Rule {
    def violated: Column = {
      val v = trim(col(column))
      val expected = element_at(typedLit(mapping.map { case (k, l) =>
        k -> l.trim.toLowerCase }), v)
      v.isNotNull && (v =!= "") && expected.isNotNull &&
        (lower(trim(coalesce(col(labelColumn), lit("")))) =!= expected)
    }
  }

  /** Fuzzy label-similarity gate, the engine form of the reference's
    * `not_90_percent_similar_to_label` (validate.py:891-897): flag a
    * label that is LESS than `minRatio` similar to the expected text,
    * case-insensitive. Similarity here is normalized edit-distance
    * (1 − levenshtein/max-length) via Spark's codegen'd `levenshtein` —
    * a declared analogue of difflib's SequenceMatcher ratio with the
    * same contract (≈identical strings score ~1, unrelated ~0).
    */
  final case class SimilarToLabel(column: String, expected: String,
      minRatio: Double, code: String) extends Rule {
    def violated: Column = {
      val a = lower(trim(col(column)))
      val b = lit(expected.trim.toLowerCase)
      val ratio = lit(1.0) - levenshtein(a, b).cast("double") /
        greatest(length(a), length(b), lit(1))
      col(column).isNotNull && ratio < minRatio
    }
  }

  /** One field's validation metadata — the engine-side shape of the
    * reference's per-script field_info entries (utils/field_info.py:
    * key/dataType/optional/minValue/maxValue/options).
    */
  final case class FieldInfo(
      key: String,
      dataType: String = "",
      optional: Boolean = true,
      minValue: Option[Double] = None,
      maxValue: Option[Double] = None,
      options: Seq[String] = Nil,
      optionLabels: Map[String, String] = Map.empty)

  // the reference's format regexes (validate.py:470-537), each allowing
  // blank — blanks are the required-check's business, not the type check's
  private val NumericRegex  = """^\s*$|^-?\d+(\.\d+)?([eE][+-]?\d+)?$"""
  private val DatetimeRegex = """^\s*$|^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:\d{2})?)?$"""
  private val BooleanRegex  = """(?i)^\s*$|^(true|false|1|0|y|n|yes|no)$"""

  /** Compile field metadata into the rule ADT — the reference's
    * metadata-driven expectation suite (validate.py::
    * validate_dataframe_with_ge builds its checks from field_info at
    * runtime) as a pure rule-list generator. Per-field emission order
    * mirrors the reference's loop: required → range → type format →
    * allowed values; fields are processed in the given order.
    *
    * `colName` maps a metadata key to its frame column (default: graft's
    * wide-table `<key>_value` convention). Range rules compare through
    * Spark's string→double cast, so non-numeric values skip the range
    * check and fire the format rule instead — the same split as the
    * reference's convert-then-check.
    */
  def fromFieldInfo(fields: Seq[FieldInfo],
                    colName: String => String = k => s"${k}_value",
                    labelColName: String => String = k => s"${k}_label"): Seq[Rule] =
    fields.flatMap { f =>
      val c = colName(f.key)
      val required = if (!f.optional) Seq(RequiredPresent(c, s"${f.key}_required")) else Nil
      val range = f.minValue.map(m => Min(c, m, s"${f.key}_below_min")).toSeq ++
        f.maxValue.map(m => Max(c, m, s"${f.key}_above_max")).toSeq
      val format = f.dataType match {
        case "number" | "integer" | "float" | "timer" =>
          Seq(MatchesRegex(c, NumericRegex, s"${f.key}_non_numeric"))
        case "datetime" | "timestamp" | "date" =>
          Seq(MatchesRegex(c, DatetimeRegex, s"${f.key}_bad_datetime"))
        case "boolean" | "yesno" =>
          Seq(MatchesRegex(c, BooleanRegex, s"${f.key}_bad_boolean"))
        case _ => Nil
      }
      val domain = if (f.options.nonEmpty)
        Seq(InSet(c, f.options, s"${f.key}_bad_value")) else Nil
      val labels = if (f.optionLabels.nonEmpty)
        Seq(LabelMatchesOption(c, labelColName(f.key), f.optionLabels,
          s"${f.key}_label_mismatch")) else Nil
      required ++ range ++ format ++ domain ++ labels
    }

  /** DataFrame form of [[fromFieldInfo]]: a metadata frame with columns
    * (key, data_type, optional, min_value, max_value, options) — e.g. the
    * parsed script-config JSON — collected to the driver (plan-time: the
    * metadata IS the schema, hundreds of rows at most) and compiled.
    * Fields are sorted by key for a deterministic rule order.
    */
  def fromFieldInfoDf(meta: DataFrame,
                      colName: String => String = k => s"${k}_value",
                      labelColName: String => String = k => s"${k}_label"): Seq[Rule] = {
    // option_labels (map<value, expected label>) is an optional metadata
    // column — older metadata frames without it compile the same suite
    val labelsCol =
      if (meta.columns.contains("option_labels")) col("option_labels")
      else lit(null).cast("map<string,string>")
    val fields = meta
      .select(col("key"), col("data_type"), col("optional"),
        col("min_value").cast("double"), col("max_value").cast("double"),
        col("options"), labelsCol.as("option_labels"))
      .collect().map { r =>
        FieldInfo(r.getString(0),
          Option(r.getString(1)).getOrElse(""),
          if (r.isNullAt(2)) true else r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) Nil else r.getSeq[String](5),
          if (r.isNullAt(6)) Map.empty else r.getMap[String, String](6).toMap)
      }.sortBy(_.key).toSeq
    fromFieldInfo(fields, colName, labelColName)
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
