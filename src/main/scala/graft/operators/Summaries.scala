package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Summary-table operators.
  *
  * Reference semantics: summary_counts = GROUP BY facility × MonthYear of
  * SUM(0/1 outcome flags) (reference: queries/create_summary_counts_sql.py:1);
  * completeness summaries = % non-null per column (reference:
  * queries/create_summary_maternal_completeness_sql.py,
  * nodes_grouped/step_4_nodes/summary_baseline.py).
  *
  * Scale notes: completeness is ONE aggregation pass over all columns
  * (count(col) skips nulls), not a job per column; flag sums partial-
  * aggregate map-side. Decimal sums are exact and order-independent so
  * results are reproducible run-to-run regardless of partitioning.
  */
object Summaries {

  /** GROUP BY `keys`, summing each named conditional flag. */
  def flagCounts(df: DataFrame, keys: Seq[String], flags: Seq[(String, Column)]): DataFrame = {
    val aggs = flags.map { case (name, cond) => sum(when(cond, 1L).otherwise(0L)).as(name) }
    df.groupBy(keys.map(col).toIndexedSeq: _*).agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** Single-row completeness summary: for each column, fraction non-null
    * (4 dp). One pass, one partial-aggregable plan.
    */
  def completeness(df: DataFrame, cols: Seq[String]): DataFrame = {
    // raw double division (no rounding): bit-identical across engines,
    // order-independent — safe for exact result comparison
    val aggs = cols.map { c =>
      (count(col(c)).cast("double") / count(lit(1))).as(s"${c}_complete")
    }
    df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** Completeness counting only non-null AND non-blank values — the
    * reference's string-column semantics (maternal_completeness treats ''
    * as missing). Same single-pass shape as [[completeness]].
    */
  def completenessNonEmpty(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map { c =>
      (count(when(col(c).isNotNull && length(trim(col(c).cast("string"))) > 0, 1))
        .cast("double") / count(lit(1))).as(s"${c}_complete")
    }
    df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }
}
