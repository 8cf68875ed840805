package graft.operators

import org.apache.spark.sql.{DataFrame}
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
                   includeUnchanged: Boolean = false): DataFrame = {
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
    val cond = keys.map(k => o(s"__o_$k") <=> n(s"__n_$k")).reduce(_ && _)
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
}
