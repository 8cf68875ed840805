package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.ReferencePipeline

/** End-to-end incremental run: the reference's cron loop is "new export
  * files land → merge_all upserts them into the raw store keep-latest →
  * the derived tables are rebuilt and swapped in" (reference:
  * nodes_grouped/step_7_nodes/merge_all.py + the Kedro cron pipeline).
  * This spec drives that loop twice over a real file stream:
  * StreamUpsert ingests two successive raw increments, the full pipeline
  * republishes after each, and the assertions pin keep-latest semantics
  * ACROSS increments plus atomic republish visibility.
  */
class IncrementalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def session(uid: String, temp: String, started: String): String =
    s"""{"scriptid":"adm","facility":"F1","uid":"$uid",
        "started_at":"$started","completed_at":"$started",
        "entries":[{"key":"Temp","values":[{"value":"$temp","label":"T"}]}]}"""
      .replaceAll("\n\\s*", "")

  test("two raw increments: stream-upsert keep-latest + atomic republish, end to end") {
    val srcDir = Files.createTempDirectory("inc_src").toString
    val rawTable = Files.createTempDirectory("inc_tbl").toString + "/raw"
    val ckpt = Files.createTempDirectory("inc_ckpt").toString
    val pubDir = Files.createTempDirectory("inc_pub").toString

    // the parsed-session schema is the upsert key surface; the stream
    // parses each text line exactly like the batch pipeline does
    def startUpsert() = {
      val lines = spark.readStream.text(srcDir).withColumnRenamed("value", "json")
      val parsed = graft.operators.JsonImport.parseSessions(lines, "json")
        .filter(!col("is_corrupt") && col("uid").isNotNull)
      graft.streaming.StreamUpsert.start(parsed, rawTable,
        keys = Seq("uid", "scriptid"), orderCol = "started_at",
        tieBreak = "completed_at", checkpoint = ckpt)
    }

    def republish(): Unit = {
      val out = ReferencePipeline.run(
        spark.read.parquet(rawTable), "raw_json", Seq("Temp"),
        persistShared = true)
      ReferencePipeline.publish(out, pubDir)
    }

    // ── increment 1: first exports for U1 and U2 ──────────────────────────
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/inc1.txt"),
      Seq(session("u1", "35.0", "2026-01-01T08:00:00"),
        session("u2", "36.5", "2026-01-01T09:00:00")).mkString("\n"))
    val q1 = startUpsert()
    q1.processAllAvailable(); q1.stop()
    republish()
    val first = spark.read.parquet(s"$pubDir/admissions")
    assert(first.count() === 2)
    assert(first.filter(col("uid") === "U1").select("temp_value")
      .as[String].head() === "35.0")

    // ── increment 2: U1 RESUBMITS (later start) + new U3 ─────────────────
    // the stream restarts from its checkpoint — the cron-tick shape — and
    // must merge against the EXISTING table, not start fresh
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/inc2.txt"),
      Seq(session("u1", "36.6", "2026-01-02T08:00:00"),
        session("u3", "37.1", "2026-01-02T09:00:00")).mkString("\n"))
    val q2 = startUpsert()
    q2.processAllAvailable(); q2.stop()
    republish()

    val adm = spark.read.parquet(s"$pubDir/admissions")
    // keep-latest ACROSS increments: U1 appears once, with the resubmitted
    // value; U2 survives from increment 1; U3 is new
    assert(adm.count() === 3)
    val byUid = adm.select("uid", "temp_value")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byUid === Map("U1" -> "36.6", "U2" -> "36.5", "U3" -> "37.1"))
    // atomic visibility: republish left no half-written or stranded temp
    // dirs next to any table
    val leftovers = new java.io.File(pubDir).listFiles().map(_.getName)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    // the joined table rebuilt too (downstream of the raw store) — one
    // row per admission, resubmission not duplicated
    assert(spark.read.parquet(s"$pubDir/joined").count() === 3)
  }
}
