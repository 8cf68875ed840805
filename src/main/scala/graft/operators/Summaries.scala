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

  /** Per-column numeric profile — one row per column with count / null
    * count / min / max / mean / median — the dataset-card statistics a
    * corpus release ships. ONE aggregation pass over all columns, then a
    * `stack` unpivot of the single result row (driver-side-tiny).
    *
    * Mean follows the float discipline: exact decimal(28,6) sum cast to
    * double, then divided — order-independent, engine-portable. Median is
    * `approx_percentile` (t-digest-style sketch, partial-aggregable,
    * bounded memory) by default; `exact = true` switches to the exact
    * `percentile` aggregate, which BUFFERS every value of the column per
    * partial — the declared small-data/oracle yardstick, not the 100 TB
    * path.
    */
  def numericProfile(df: DataFrame, cols: Seq[String],
                     exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    // helper aliases go through selectExpr — backtick-quote them (and
    // escape the label literal) so names like `price-usd` or `a.b` don't
    // parse as arithmetic / struct access
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    def lit_(s: String) = "'" + s.replace("'", "''") + "'"
    val aggs = cols.flatMap { c =>
      val d = col(c).cast("double")
      val p50 =
        if (exact) call_function("percentile", d, lit(0.5))
        else call_function("approx_percentile", d, lit(0.5), lit(10000))
      Seq(
        count(col(c)).as(s"__n__$c"),
        count(when(col(c).isNull, 1)).as(s"__nn__$c"),
        min(d).as(s"__min__$c"),
        max(d).as(s"__max__$c"),
        sum(col(c).cast("decimal(28,6)")).cast("double").as(s"__sum__$c"),
        p50.as(s"__p50__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val stackArgs = cols.map(c =>
      s"${lit_(c)}, ${q(s"__n__$c")}, ${q(s"__nn__$c")}, ${q(s"__min__$c")}, " +
        s"${q(s"__max__$c")}, ${q(s"__sum__$c")}, ${q(s"__p50__$c")}").mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_non_null, n_null, min, max, __sum, p50)")
      .withColumn("mean", col("__sum") / col("n_non_null"))
      .select("column_name", "n_non_null", "n_null", "min", "max", "mean", "p50")
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
