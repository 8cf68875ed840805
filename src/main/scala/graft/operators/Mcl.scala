package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-choice-list (MCL) explosion.
  *
  * Reference semantics: clinical forms store multi-select answers as one
  * delimited string column; the pipeline explodes each into a per-choice
  * table and recodes choice codes to display labels (reference:
  * data_tyding/explode_mcl_columns.py, tidy_admissions_discharges_and_
  * create_mcl_tables.py).
  *
  * Scale notes: explode is a narrow Generate — no shuffle; the label
  * recode is a literal-map lookup (codegen'd), not a join. Any group-count
  * downstream is the caller's aggregation.
  */
object Mcl {

  /** One row per choice of a delimited multi-choice column. Blank/empty
    * selections yield no rows; choices are trimmed. `explode_outer` keeps
    * the source row when you need left-join-like semantics — here the
    * reference drops empty selections, so plain explode of the cleaned
    * array.
    */
  def explodeChoices(df: DataFrame, mclCol: Column, sep: String = ",",
                     outCol: String = "choice"): DataFrame = {
    // Pattern.quote: `sep` is a plain delimiter in this API, but split()
    // takes a REGEX — an unquoted "|" or "." would split on every char
    val choices = filter(
      transform(split(mclCol, java.util.regex.Pattern.quote(sep)), trim(_)),
      c => length(c) > 0)
    // explode_outer, NOT explode: plain explode makes Catalyst infer
    // `size(choices) > 0` and push it below the Generate, re-evaluating
    // the split/transform/filter chain a second (and third) time per row —
    // the trap documented at NearDup.ngramJaccardPairs. Empty selections
    // surface as one null choice and are dropped by a filter on the
    // GENERATED column, which cannot sink below the Generate.
    df.withColumn(outCol, explode_outer(choices)).filter(col(outCol).isNotNull)
  }

  /** Recode choice codes → labels with a literal map; unmapped codes pass
    * through unchanged (the reference's fix_data_labels behavior).
    */
  def recodeChoice(choice: Column, labels: Map[String, String]): Column =
    if (labels.isEmpty) choice
    else coalesce(element_at(typedLit(labels), choice), choice)
}
