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
    * partial — the declared small-data/oracle yardstick. When the median
    * must be EXACT at scale, use [[exactQuantile]] (iterative histogram
    * narrowing: O(log) passes, bounded memory) per column instead.
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

  /** EXACT interpolated quantile (percentile_cont semantics — identical
    * to Spark's `percentile` and DuckDB's `quantile_cont`) computed by
    * iterative histogram narrowing instead of buffering every value:
    * each round is ONE distributed conditional-count pass over 128
    * equal-width buckets of the candidate interval, the interval narrows
    * to the bucket(s) holding the target ranks, and once few enough
    * candidates remain they are collected and selected exactly. O(log)
    * passes, bounded driver data — the 100 TB path for exact medians,
    * where the `percentile` aggregate (which holds a value→count map per
    * partial) and [[numericProfile]]'s exact mode stop scaling.
    *
    * Massive ties converge by interval collapse (a bucket whose bounds
    * are consecutive doubles yields its candidates directly). NaNs are
    * excluded (SQL aggregate semantics); returns None for an empty/all-
    * null column.
    */
  def exactQuantile(df: DataFrame, c: String, q: Double,
                    collectThreshold: Int = 1 << 20): Option[Double] = {
    require(q >= 0 && q <= 1, s"quantile must be in [0, 1], got $q")
    require(collectThreshold >= 2, "collectThreshold must be >= 2")
    val v = col(c).cast("double")
    val vals = df.select(v.as("v")).filter(col("v").isNotNull && !isnan(col("v")))
    val head0 = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val n = head0.getLong(0)
    if (n == 0) return None
    if (n == 1 || head0.getDouble(1) == head0.getDouble(2))
      return Some(head0.getDouble(1)) // single value or all-equal column
    // percentile_cont: 0-based real rank r = q(n−1); need order statistics
    // at floor(r) and ceil(r), then linear interpolation
    val r = q * (n - 1)
    val kLo = math.floor(r).toLong // 0-based
    val kHi = math.ceil(r).toLong
    // selectKth: exact j-th smallest (0-based) by narrowing [lo, hi]
    def selectKth(j: Long): Double = {
      var lo = head0.getDouble(1); var hi = head0.getDouble(2)
      var below = 0L                    // count of values < lo
      var inCount = n                   // count of values in [lo, hi]
      var stalled = false
      while (inCount > collectThreshold && lo < hi && !stalled) {
        val width = (hi - lo) / 128.0
        val bucket = least(floor((col("v") - lit(lo)) / lit(width)), lit(127.0))
          .cast("int")
        val counts = vals.filter(col("v") >= lo && col("v") <= hi)
          .groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
          .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
        var acc = below; var chosen = -1
        var b = 0
        while (b < 128 && chosen < 0) {
          val cb = counts.getOrElse(b, 0L)
          if (acc + cb > j) chosen = b else acc += cb
          b += 1
        }
        if (chosen < 0) chosen = 127 // float-boundary shortfall: take the top bucket
        val newLo = lo + chosen * width
        val newHi = if (chosen == 127) hi else lo + (chosen + 1) * width
        // floor() in double math can place boundary values a bucket off;
        // widen by one ulp each side and recount authoritatively
        val lo2 = math.nextDown(newLo); val hi2 = math.nextUp(newHi)
        val in2 = vals.filter(col("v") >= lo2 && col("v") <= hi2)
          .agg(count(lit(1))).head().getLong(0)
        // NO PROGRESS (a tie cluster denser than the threshold, or width
        // underflow): the candidates share at most a handful of DISTINCT
        // values — select among those exactly instead of looping forever
        val below2 = vals.filter(col("v") < lo2).agg(count(lit(1))).head().getLong(0)
        // commit the narrowed interval only if it (a) made progress and
        // (b) still CONTAINS rank j — float-floor can bucket a borderline
        // value a slot off; on either failure fall back to exact
        // distinct-value selection over the CURRENT (provably containing)
        // interval instead of narrowing wrong
        if (in2 >= inCount || !(below2 <= j && j < below2 + in2)) {
          stalled = true
        } else {
          lo = lo2; hi = hi2; inCount = in2; below = below2
        }
      }
      if (stalled || inCount > collectThreshold) {
        // distinct-value selection: exact for any tie profile with a
        // bounded number of distinct candidates in the final interval
        val dv = vals.filter(col("v") >= lo && col("v") <= hi)
          .groupBy(col("v")).agg(count(lit(1)).as("c")).orderBy(col("v"))
          .limit(collectThreshold + 1).collect()
        require(dv.length <= collectThreshold,
          "exactQuantile: narrowing stalled with too many distinct candidates " +
            "— raise collectThreshold")
        var acc2 = below
        for (row <- dv) {
          if (acc2 + row.getLong(1) > j) return row.getDouble(0)
          acc2 += row.getLong(1)
        }
        return dv.last.getDouble(0)
      }
      if (lo >= hi) return lo // interval closed: every remaining value is lo
      val remaining = vals.filter(col("v") >= lo && col("v") <= hi)
        .orderBy(col("v")).collect().map(_.getDouble(0))
      remaining((j - below).toInt)
    }
    val loV = selectKth(kLo)
    val hiV = if (kHi == kLo) loV else selectKth(kHi)
    Some(loV + (r - kLo) * (hiV - loV))
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
