package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the reference's incremental-import
  * "skip already-present (uid, script) pairs" (reference:
  * data_tyding/import_raw_jsons.py duplicates check +
  * queries/data_fix.py::deduplicate_table) as a continuous operator
  * instead of a per-cron-tick SQL pass.
  *
  * Scale notes: `dropDuplicatesWithinWatermark` bounds the dedup state by
  * event time — keys older than the watermark are evicted, so state size
  * tracks the lateness window, not history. Unbounded-history dedup on a
  * stream is a memory leak at 100 TB/day; if whole-history dedup is
  * required, land the stream first and run the batch [[graft.operators
  * .Dedup]] over the lake.
  */
object StreamDedup {

  /** One row per key within the watermark horizon; `tsCol` must carry the
    * stream's event-time watermark.
    */
  def withinWatermark(events: DataFrame, keys: Seq[String],
                      tsCol: String, delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
