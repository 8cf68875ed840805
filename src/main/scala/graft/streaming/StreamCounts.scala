package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous summary counts: event-time windowed flag sums over a stream
  * — the reference's summary_counts table (facility × month of outcome
  * flags, reference: queries/create_summary_counts_sql.py) maintained
  * incrementally instead of recomputed per cron tick.
  *
  * Scale notes: watermark + tumbling window bounds the aggregation state
  * to the lateness horizon; sums partial-aggregate before the shuffle
  * exactly like the batch twin. Append mode emits a window only once it
  * can no longer change — the natural feed for a downstream parquet sink
  * partitioned by window start.
  */
object StreamCounts {

  /** Tumbling-window conditional counts per group.
    *
    * @param tsCol event-time column (carries the watermark)
    * @param delay allowed lateness, e.g. "1 hour"
    * @param windowLen tumbling window length, e.g. "1 day"
    * @param flags (name, condition) pairs summed as 0/1 per window×group
    */
  def windowedFlagCounts(events: DataFrame, tsCol: String, delay: String,
                         windowLen: String, groupCols: Seq[String],
                         flags: Seq[(String, Column)]): DataFrame = {
    require(flags.nonEmpty, "windowedFlagCounts needs at least one flag")
    val aggs = flags.map { case (name, cond) => sum(when(cond, 1L).otherwise(0L)).as(name) }
    events.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        (groupCols.map(col) ++ flags.map(f => col(f._1))): _*)
  }

  /** Streaming gap sessions via the built-in `session_window`: the
    * streaming form of q46 (same gap-merge semantics, state bounded by
    * the watermark, sessions emitted when the watermark passes their
    * close). One state row per OPEN session per key — no per-event state.
    */
  def sessionCounts(events: DataFrame, tsCol: String, delay: String,
                    gap: String, keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +:
        (keyCols.map(col) :+ col("n_events")): _*)
}
