package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-value → wide-column extraction.
  *
  * Reference semantics: session entries are a key→value store pivoted into
  * one wide row per session (`<Key>.value`, `<Key>.label` columns)
  * (reference: data_tyding/extract_key_values.py:1,
  * tidy_admissions_discharges_and_create_mcl_tables.py).
  *
  * Scale notes: always pivot with an EXPLICIT value list — Spark otherwise
  * runs an extra job to collect distinct keys to the driver. With the list
  * given, the pivot is a single shuffle (hash aggregate with one slot per
  * key), identical in cost to a conditional aggregation.
  */
object Pivot {

  /** Pivot `kvKey` values into wide columns aggregated by `agg` per group. */
  def toWide(df: DataFrame, groupKeys: Seq[String], kvKey: String,
             keyValues: Seq[String], agg: Column): DataFrame =
    df.groupBy(groupKeys.map(col).toIndexedSeq: _*)
      .pivot(kvKey, keyValues)
      .agg(agg)

  /** Conditional-aggregation form — the plan a hand-written
    * `SUM(CASE WHEN k='a' THEN v ELSE 0 END)` gives; useful when column
    * naming must be controlled precisely. NOT result-identical to
    * [[toWide]]: the `ELSE 0` makes groups where a key never occurs read
    * 0, where the pivot form reads NULL — pick the form whose
    * absent-vs-zero semantics the consumer needs.
    */
  def toWideConditional(df: DataFrame, groupKeys: Seq[String], kvKey: String,
                        keyValues: Seq[String], valueExpr: Column): DataFrame = {
    val aggs = keyValues.map { k =>
      sum(when(col(kvKey) === k, valueExpr).otherwise(lit(0))).as(k)
    }
    df.groupBy(groupKeys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }
}
