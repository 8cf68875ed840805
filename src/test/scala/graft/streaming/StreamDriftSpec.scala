package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Summaries
import graft.streaming.StreamDrift

/** The streaming drift monitor: windowed bin counts as the only state,
  * per-window PSI finalized against a frozen reference — each closed
  * window must score exactly what batch psiDrift computes over the same
  * slice.
  */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("per-window PSI equals batch psiDrift on each closed window (file stream, two increments)") {
    // reference: v1 uniform-ish around 0..19, v2 constant-ish
    val ref = (0 until 100).map(i => ((i % 20).toDouble, (i % 4).toDouble))
      .toDF("v1", "v2")
    val profile = StreamDrift.referenceProfile(ref, Seq("v1", "v2"), nBins = 5)

    // stream: window A (10:00) matches the reference; window B (11:00) is
    // shifted far right on v1 (major drift) and leaves v2 alone
    val winA = (0 until 60).map(i => (ts(10, i % 50), (i % 20).toDouble, (i % 4).toDouble))
    val winB = (0 until 60).map(i => (ts(11, i % 50), 100.0 + (i % 20), (i % 4).toDouble))
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    winA.toDF("ts", "v1", "v2").write.parquet(s"$dir/in1")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in*")
    val counts = StreamDrift.binnedCounts(stream, "ts", "5 minutes", "1 hour",
      Seq("v1", "v2"), profile)
    val q = counts.writeStream.format("memory").queryName("drift_counts")
      .outputMode("append").start()
    q.processAllAvailable()
    // increment 2: window B plus a 13:00 sentinel that pushes the
    // watermark past both A and B so append emits them
    (winB :+ ((ts(13, 30), 0.0, 0.0))).toDF("ts", "v1", "v2")
      .write.mode("append").parquet(s"$dir/in2")
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("drift_counts")
    val scored = StreamDrift.psiOfWindows(emitted, profile)
      .collect().map(r => (r.getTimestamp(0), r.getString(2),
        r.getDouble(3), r.getString(4)))
    // both closed windows emitted, each scoring both columns
    val byWindow = scored.groupBy(_._1)
    assert(byWindow.keySet === Set(ts(10, 0), ts(11, 0)), byWindow.keySet.toString)

    // parity: each window's (col, psi, drift) equals batch psiDrift over
    // exactly that window's rows
    for ((start, rows) <- byWindow) {
      val slice = (if (start == ts(10, 0)) winA else winB)
        .map { case (_, a, b) => (a, b) }.toDF("v1", "v2")
      val batch = Summaries.psiDrift(ref, slice, Seq("v1", "v2"), nBins = 5)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
      assert(rows.map(r => (r._2, r._3, r._4)).toSet === batch,
        s"window $start: stream ${rows.toSeq} vs batch $batch")
    }
    // and the semantics read right: A stable on both, B major on v1 only
    val graded = scored.map(r => (r._1, r._2) -> r._4).toMap
    assert(graded((ts(10, 0), "v1")) === "stable")
    assert(graded((ts(11, 0), "v1")) === "major")
    assert(graded((ts(11, 0), "v2")) === "stable")
  }

  test("stream-only bins (mass the reference never saw) keep their gain term") {
    // reference mass entirely in one cell; the window's values land in
    // the clamped far bin — cr = 0 rows must survive the finalize join
    // (a reference-driven left join would silently drop the shift)
    val ref = Seq.fill(50)(0.0).toDF("v1")
    val profile = StreamDrift.referenceProfile(ref, Seq("v1"), nBins = 5)
    val win = Seq((ts(10, 0), 99.0), (ts(10, 1), 99.0), (ts(13, 0), 0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_drift2").toString
    win.toDF("ts", "v1").write.parquet(s"$dir/in1")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in*")
    val q = StreamDrift.binnedCounts(stream, "ts", "5 minutes", "1 hour",
      Seq("v1"), profile)
      .writeStream.format("memory").queryName("drift_counts2")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val scored = StreamDrift.psiOfWindows(spark.table("drift_counts2"), profile)
      .filter(col("window_start") === ts(10, 0)).head()
    val batch = Summaries.psiDrift(ref, Seq(99.0, 99.0).toDF("v1"),
      Seq("v1"), nBins = 5).head()
    assert(scored.getAs[Double]("psi") === batch.getAs[Double]("psi"))
    assert(scored.getAs[String]("drift") === "major")
  }
}
