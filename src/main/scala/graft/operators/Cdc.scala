package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-level change data capture: the key-level diff of two table
  * versions — what a lake publish needs to emit a change feed (or audit
  * a re-run) without a transaction log. The reference's cron pipeline
  * republishes whole tables each tick (reference: automation.py,
  * queries/update_uid.py's replace-then-merge); diffing consecutive
  * publishes is how a consumer turns that into increments.
  *
  * Output: key columns + `change` ∈ added | removed | changed (+
  * unchanged when asked) + `changed_cols` (the exact columns whose
  * values differ, NULL-safe compared; empty for added/removed).
  *
  * Scale shape: ONE full-outer shuffle join on the key — the minimum
  * for an unordered diff; both sides arrive hash-partitioned on the key,
  * so consecutive diffs against a bucketed-by-key publish skip even
  * that exchange. Column comparison is a codegen conjunction (no
  * per-column jobs, no row serialization); `changed_cols` materializes
  * from the same comparisons via a filtered array literal.
  */
object Cdc {

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
                   includeUnchanged: Boolean = false,
                   assumeKeysNotNull: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    val compareCols = oldSnap.columns.filterNot(keys.contains)
      .filter(newSnap.columns.contains).toSeq
    require(compareCols.nonEmpty,
      "snapshotDiff: no common non-key columns to compare")
    // presence markers, not key-NULL checks: a legitimately-NULL key
    // (null-safe joined) must not read as absent
    val o = oldSnap.select((keys ++ compareCols).map(c =>
      col(c).as(s"__o_$c")) :+ lit(1).as("__o_present"): _*)
    val n = newSnap.select((keys ++ compareCols).map(c =>
      col(c).as(s"__n_$c")) :+ lit(1).as("__n_present"): _*)
    // assumeKeysNotNull: plain equality instead of <=>. Catalyst rewrites
    // null-safe keys to (coalesce(k, d), isnull(k)) — a partitioning the
    // bucketed scan's HashPartitioning(k) can NOT satisfy, so the <=>
    // form always re-shuffles even over a bucketed-by-key publish. With
    // no NULL keys the two conditions are equivalent and the === form
    // consumes the write-time bucketing (zero Exchange, PlanSpec-pinned).
    // CALLER CONTRACT: under the flag a NULL key never matches and would
    // misreport as an added+removed pair — set it only for publishes
    // whose keys are genuinely non-NULL (e.g. groupBy keys of rollups).
    val cond = keys.map(k =>
      if (assumeKeysNotNull) o(s"__o_$k") === n(s"__n_$k")
      else o(s"__o_$k") <=> n(s"__n_$k")).reduce(_ && _)
    val joined = o.join(n, cond, "full_outer")
    val inOld = col("__o_present").isNotNull
    val inNew = col("__n_present").isNotNull
    val diffs = compareCols.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    val changedCols = array_compact(array(diffs: _*))
    val change = when(!inOld, lit("added"))
      .when(!inNew, lit("removed"))
      .when(size(changedCols) > 0, lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined.select(
      keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k)) ++
        Seq(change.as("change"),
          when(change.isin("added", "removed"),
            array().cast("array<string>")).otherwise(changedCols)
            .as("changed_cols")): _*)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }

  /** Incremental aggregate maintenance: merge partial aggregate tables
    * (yesterday's published rollup + today's increment rollup) into the
    * up-to-date rollup WITHOUT rescanning history — the aggregation
    * twin of [[snapshotDiff]]'s republish-to-increments move, and the
    * reason additive stats (count/sum/min/max — and HLL sketches via
    * [[Summaries.mergeDistinctSketches]]) are the ones worth publishing:
    * at 100 TB the history scan is the cost, and a merge over two
    * already-tiny aggregate tables replaces it entirely. Non-additive
    * stats (avg, ratios) must be DERIVED after the merge from the
    * additive parts — deriving-then-merging is the classic wrong answer
    * and the reason this operator only accepts additive columns.
    *
    * All parts must share the key schema; a key present in one part
    * only passes through (its stats are the merge identity).
    *
    * Scale notes: one union + one map-side-combined hash agg over
    * aggregate-table-sized inputs (≤ Σ distinct keys, not raw rows);
    * decimal sums stay exact through the merge.
    */
  def mergeAdditive(parts: Seq[DataFrame], keys: Seq[String],
                    countCols: Seq[String] = Seq.empty,
                    sumCols: Seq[String] = Seq.empty,
                    minCols: Seq[String] = Seq.empty,
                    maxCols: Seq[String] = Seq.empty): DataFrame = {
    require(parts.size >= 2, "mergeAdditive needs at least two parts")
    require(keys.nonEmpty, "mergeAdditive needs at least one key column")
    val stats = countCols ++ sumCols ++ minCols ++ maxCols
    require(stats.nonEmpty, "mergeAdditive needs at least one stat column")
    require(stats.distinct.size == stats.size, "duplicate stat columns")
    val aggs = countCols.map(c => sum(col(c)).as(c)) ++
      sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** The two-part additive merge as a KEY JOIN — the form that keeps a
    * bucketed HISTORY side out of the shuffle even when the increment is
    * not bucketed. When BOTH parts are same-bucketed publishes,
    * [[mergeAdditive]]'s union + groupBy is already exchange-free (Spark's
    * Union reports the common bucketing — pinned in StreamBucketSpec);
    * the asymmetric daily case is where it re-shuffles EVERYTHING:
    * union(bucketed 100 TB rollup, fresh increment) has no common
    * partitioning, so the whole history pays the exchange again. The
    * full-outer join instead satisfies its distribution from the
    * history's bucketing and shuffles ONLY the increment
    * (PlanSpec-pinned: zero bucketed scans below any Exchange), and the
    * stat merge becomes a codegen projection: count/sum add with NULL as
    * the identity, min/max take the null-safe least/greatest. Semantics
    * are spec-pinned EQUAL to `mergeAdditive(Seq(oldPart, incPart), ...)`
    * — including single-sided keys (stats pass through) and NULL keys
    * (null-safe matched, one output row).
    *
    * This is the daily-increment fast path (exactly two parts:
    * yesterday's publish + today's increment); for k-way catch-up merges
    * fold it left — each fold keeps the accumulating side unshuffled
    * when it is republished bucketed.
    *
    * PRECONDITION: each part carries AT MOST ONE row per key — the shape
    * an aggregated publish produces. [[mergeAdditive]]'s groupBy would
    * collapse within-part duplicates; the join form fans them out
    * instead (a 2×2 match per duplicated key), so feeding unaggregated
    * parts here silently double-counts. Pre-aggregate each part (or use
    * `mergeAdditive`) if uniqueness isn't guaranteed. Stat columns must
    * also be disjoint from key columns (enforced) — a shared name would
    * collide the __o_/__n_ aliases.
    */
  def mergeAdditiveJoined(oldPart: DataFrame, incPart: DataFrame,
                          keys: Seq[String],
                          countCols: Seq[String] = Seq.empty,
                          sumCols: Seq[String] = Seq.empty,
                          minCols: Seq[String] = Seq.empty,
                          maxCols: Seq[String] = Seq.empty,
                          assumeKeysNotNull: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "mergeAdditiveJoined needs at least one key column")
    val stats = countCols ++ sumCols ++ minCols ++ maxCols
    require(stats.nonEmpty, "mergeAdditiveJoined needs at least one stat column")
    require(stats.distinct.size == stats.size, "duplicate stat columns")
    require(stats.toSet.intersect(keys.toSet).isEmpty,
      s"stat columns must be disjoint from key columns, both contain: " +
        stats.toSet.intersect(keys.toSet).toSeq.sorted.mkString(", "))
    val o = oldPart.select((keys ++ stats).map(c => col(c).as(s"__o_$c")): _*)
    val n = incPart.select((keys ++ stats).map(c => col(c).as(s"__n_$c")): _*)
    // same ===-vs-<=> trade as [[snapshotDiff]]: the flag is what lets a
    // bucketed publish skip the exchange; a NULL key under it would merge
    // as two separate rows instead of one
    val cond = keys.map(k =>
      if (assumeKeysNotNull) o(s"__o_$k") === n(s"__n_$k")
      else o(s"__o_$k") <=> n(s"__n_$k")).reduce(_ && _)
    def merged(c: String, f: (Column, Column) => Column): Column = {
      val (a, b) = (col(s"__o_$c"), col(s"__n_$c"))
      // absent/NULL side is the merge identity — matches sum/min/max over
      // the union'd rows (all-NULL in → NULL out)
      when(a.isNull, b).when(b.isNull, a).otherwise(f(a, b)).as(c)
    }
    o.join(n, cond, "full_outer").select(
      keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k)) ++
        (countCols ++ sumCols).map(c => merged(c, _ + _)) ++
        minCols.map(c => merged(c, least(_, _))) ++
        maxCols.map(c => merged(c, greatest(_, _))): _*)
  }
}
