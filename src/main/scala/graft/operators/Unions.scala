package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Union-view operators.
  *
  * Reference semantics: per-facility tables are UNION ALL'd into country
  * views, padding columns missing on either side with NULL
  * (reference: derive_data/create_union_views.py:1). merge_all then
  * re-deduplicates the union keep-latest
  * (reference: nodes_grouped/step_7_nodes/merge_all.py:1).
  *
  * Scale notes: `unionByName` is a zero-shuffle plan-level concat; each
  * input keeps its own partitioning. The dedup after a merge is the
  * aggregation-based keep-latest (see [[Dedup.keepLatest]]) so the merged
  * upsert costs exactly one shuffle.
  */
object Unions {

  /** UNION ALL with schema alignment by column name; missing columns → NULL. */
  def unionViews(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Tagged union: add a `source` discriminator column per input (the
    * reference tags rows with their facility).
    */
  def taggedUnion(parts: Seq[(String, DataFrame)], tagCol: String = "source_view"): DataFrame =
    unionViews(parts.map { case (tag, df) => df.withColumn(tagCol, lit(tag)) })
}
