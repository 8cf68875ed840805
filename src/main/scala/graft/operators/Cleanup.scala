package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col}

/** Post-derivation cleanup: column drops and name normalization.
  *
  * Reference semantics: the final pipeline step drops redundant columns
  * and normalizes names before publishing (reference:
  * nodes_grouped/step_6_nodes/data_clean_up.py).
  *
  * Pure metadata operations — both are plan-level projections with zero
  * runtime cost at any scale.
  */
object Cleanup {

  /** Drop columns if present (missing names are ignored, like the
    * reference's defensive ALTER TABLE DROP IF EXISTS).
    */
  def dropRedundant(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** Drop columns whose NAMES mark confidential content, by
    * case-insensitive substring match (reference: queries/data_fix.py:
    * 77-104 `drop_confidential_columns` — `column_name ILIKE '%dobtob%'
    * OR ... '%firstname%' OR ... '%lastname%'` before publish). Pure
    * metadata projection; the publish path applies it to every table so
    * a confidential column can never reach disk.
    */
  val DefaultConfidentialMarkers: Seq[String] =
    Seq("dobtob", "firstname", "lastname")

  def dropConfidential(df: DataFrame,
                       markers: Seq[String] = DefaultConfidentialMarkers): DataFrame = {
    val lowered = markers.map(_.toLowerCase(java.util.Locale.ROOT))
    df.drop(df.columns.filter { c =>
      // match with underscores stripped as well: graft snake_cases
      // "FirstName_value" to "first_name_value", which no longer CONTAINS
      // "firstname" byte-wise but is exactly the column the reference's
      // ILIKE '%firstname%' would have caught pre-snake_casing
      val lc = c.toLowerCase(java.util.Locale.ROOT)
      val flat = lc.replace("_", "")
      lowered.exists(m => lc.contains(m) || flat.contains(m))
    }.toIndexedSeq: _*)
  }

  /** Drop single-letter column names — artifact columns from bad
    * extractions that accumulate in long-lived deployments (reference:
    * queries/data_fix.py:106-241 `drop_single_letter_columns`, and the
    * joined-table regex scrub `^\d+$|^[a-zA-Z]$` in
    * create_joined_table_and_derived_columns.py:249). Also drops all-digit
    * names, matching that joined-table regex.
    */
  def dropSingleLetterColumns(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(c =>
      c.length == 1 || c.forall(_.isDigit)).toIndexedSeq: _*)

  /** Merge a legacy column into its successor: where both exist, the
    * successor keeps its value and falls back to the legacy one; where
    * only the legacy column exists, it is renamed. The legacy column is
    * dropped either way; a frame with neither passes through unchanged.
    * (Reference: data_tyding/tidy_dynamic_tables.py::
    * fix_facility_phc_columns — Facility.value folded into PHC.value —
    * the column-naming drift every long-lived form deployment
    * accumulates.) Pure projection, zero runtime cost.
    */
  def coalesceInto(df: DataFrame, legacy: String, successor: String): DataFrame = {
    val has = df.columns.toSet
    (has.contains(legacy), has.contains(successor)) match {
      case (true, true) =>
        df.withColumn(successor, coalesce(col(successor), col(legacy))).drop(legacy)
      case (true, false) => df.withColumnRenamed(legacy, successor)
      case _             => df
    }
  }

  /** Guarantee columns exist: any missing name is added as a typed NULL
    * column (reference: utils/set_key_to_none.py — downstream summaries
    * select fixed column sets, so a deployment that never filled a form
    * field must still present it). Pure projection.
    */
  def ensureColumns(df: DataFrame, cols: Seq[String],
                    dataType: String = "string"): DataFrame = {
    val present = df.columns.toSet
    val missing = cols.filterNot(present.contains)
    if (missing.isEmpty) df
    // ONE withColumns projection — a per-column withColumn fold re-runs
    // analysis over the whole plan per column (quadratic for the
    // hundreds-of-fields metadata this serves)
    else df.withColumns(missing.map(c =>
      c -> org.apache.spark.sql.functions.lit(null).cast(dataType)).toMap)
  }

  /** Rename a column only when it exists (reference: utils/key_change.py —
    * form-key drift means a batch may carry either spelling). When both
    * old and new exist, values fold via [[coalesceInto]] semantics.
    */
  def renameIfPresent(df: DataFrame, oldName: String, newName: String): DataFrame =
    if (!df.columns.contains(oldName)) df
    else coalesceInto(df, oldName, newName)

  /** snake_case one name: camelCase humps and runs of non-alphanumerics
    * become single underscores, lowercased (`Visit.Date` → `visit_date`,
    * `NeoTreeID` → `neo_tree_id`).
    */
  def snakeCase(name: String): String =
    name.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
      .toLowerCase

  /** Normalize every column name to snake_case via [[snakeCase]]. */
  def snakeCaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(snakeCase).toIndexedSeq: _*)
}
