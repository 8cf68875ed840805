package graft.operators

import org.apache.spark.sql.DataFrame

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

  /** Normalize column names to snake_case: camelCase humps and runs of
    * non-alphanumerics become single underscores, lowercased
    * (`Visit.Date` → `visit_date`, `NeoTreeID` → `neo_tree_id`).
    */
  def snakeCaseColumns(df: DataFrame): DataFrame = {
    def norm(name: String): String =
      name.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
        .replaceAll("[^A-Za-z0-9]+", "_")
        .replaceAll("_+", "_")
        .stripPrefix("_").stripSuffix("_")
        .toLowerCase
    df.toDF(df.columns.map(norm).toIndexedSeq: _*)
  }
}
