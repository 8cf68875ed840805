package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.operators.Dedup

/** Continuous merge/upsert: land a stream into a keep-latest table — the
  * reference's merge_all (union + dedup on uid keep-latest, reference:
  * nodes_grouped/step_7_nodes/merge_all.py) run per micro-batch instead of
  * per cron tick.
  *
  * Mechanics: `foreachBatch` gives each micro-batch a batch DataFrame;
  * the batch is unioned with the current table, deduped keep-latest
  * (graft's hash max_by — no sorts), and atomically swapped in. With
  * plain parquet the swap is a rewrite; on a real lakehouse the SAME
  * foreachBatch body becomes `MERGE INTO` on a table format with ACID
  * upserts — the operator boundary is identical, only the sink line
  * changes. The rewrite form is honest for moderate tables (dims,
  * clinical registries); append-only fact streams should use
  * [[StreamDedup]] + partitioned appends instead.
  */
object StreamUpsert {

  /** Upsert each micro-batch into the parquet table at `path`.
    * Returns the started query (caller stops it).
    */
  def start(stream: DataFrame, path: String, keys: Seq[String],
            orderCol: String, tieBreak: String,
            checkpoint: String): StreamingQuery =
    writer(stream, path, keys, orderCol, tieBreak)
      .option("checkpointLocation", checkpoint)
      .start()

  /** The writer, exposed so tests/callers can pick trigger/options. */
  def writer(stream: DataFrame, path: String, keys: Seq[String],
             orderCol: String, tieBreak: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      upsertBatch(batch.sparkSession, batch, path, keys, orderCol, tieBreak)
    }

  /** Any parquet part file anywhere under `dir` — a PARTITIONED table
    * keeps its files in key=value subdirectories, so a top-level-only
    * listing would declare an existing table absent and the merge would
    * silently discard its history.
    */
  private def containsParquet(dir: java.io.File): Boolean = {
    val children = dir.listFiles()
    children != null && children.exists(f =>
      (f.isFile && f.getName.endsWith(".parquet")) ||
        (f.isDirectory && containsParquet(f)))
  }

  /** One merge step: current ∪ batch → keep-latest → rewrite. */
  private[streaming] def upsertBatch(spark: SparkSession, batch: DataFrame, path: String,
                                     keys: Seq[String], orderCol: String, tieBreak: String): Unit = {
    // crash recovery: a previous run that died inside the swap leaves the
    // ONLY full copy under the rewrite's temp dir with the target gone —
    // finish that swap before merging, or the Overwrite below would
    // destroy the surviving copy and the stream would continue green with
    // one micro-batch of history
    val dir = new java.io.File(path)
    val tmpDir = new java.io.File(graft.sources.Sinks.rewriteTmpPath(path))
    if (!dir.exists() && tmpDir.isDirectory && containsParquet(tmpDir))
      graft.sources.AtomicSwap.replace(path, tmpDir.getPath)
    val hasTable = dir.exists() && containsParquet(dir)
    // the batch itself must ALSO dedup — a micro-batch can carry several
    // versions of one key (caught by a file-stream probe: 1000 events of
    // 15 users landed unmerged on the empty-table path)
    val input = if (hasTable) spark.read.parquet(path).unionByName(batch) else batch
    val merged = Dedup.keepLatest(input, keys, col(orderCol), col(tieBreak))
    // rewrite via a temp dir + swap: reading and overwriting the same
    // path in one job is unsafe with plain parquet
    graft.sources.Sinks.rewriteSwapped(merged, path)
  }
}
