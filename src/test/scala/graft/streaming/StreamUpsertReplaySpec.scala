package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

/** Exactly-once EFFECT under at-least-once delivery: `foreachBatch` can
  * re-run a micro-batch after a crash between the sink commit and the
  * checkpoint commit (the documented Structured Streaming recovery
  * contract — the reference's cron re-runs of merge_all have the same
  * at-least-once shape). The upsert body must therefore be IDEMPOTENT:
  * replaying any already-applied batch — immediately, or stale after
  * later batches landed — leaves the table byte-identical.
  */
class StreamUpsertReplaySpec extends graft.SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def snapshot(path: String): Set[(Long, Timestamp, String)] =
    spark.read.parquet(path).select("uid", "ts", "payload")
      .as[(Long, Timestamp, String)].collect().toSet

  test("replaying a micro-batch (immediately or stale) leaves the table unchanged") {
    val path = java.nio.file.Files.createTempDirectory("upsert_replay")
      .toString + "/table"
    def apply(b: DataFrame): Unit =
      StreamUpsert.upsertBatch(spark, b, path, Seq("uid"), "ts", "payload")

    val b1 = Seq((1L, ts(0), "v0"), (2L, ts(1), "v1")).toDF("uid", "ts", "payload")
    val b2 = Seq((1L, ts(5), "v2"), (3L, ts(6), "v1")).toDF("uid", "ts", "payload")

    apply(b1)
    val after1 = snapshot(path)
    assert(after1 === Set((1L, ts(0), "v0"), (2L, ts(1), "v1")))
    // crash between sink commit and checkpoint commit → same epoch re-runs
    apply(b1)
    assert(snapshot(path) === after1, "immediate replay must be a no-op")

    apply(b2)
    val after2 = snapshot(path)
    assert(after2 === Set((1L, ts(5), "v2"), (2L, ts(1), "v1"), (3L, ts(6), "v1")))
    apply(b2)
    assert(snapshot(path) === after2, "immediate replay must be a no-op")
    // STALE replay: b1 re-delivered after b2 already landed — keep-latest
    // must not regress uid 1 to its older version
    apply(b1)
    assert(snapshot(path) === after2, "stale replay must not regress rows")
  }
}
