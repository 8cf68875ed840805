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

  test("republish recovers a publish killed mid-swap AND mid-write, losing nothing") {
    val rawTable = Files.createTempDirectory("crash_tbl").toString + "/raw"
    val pubDir = Files.createTempDirectory("crash_pub").toString
    graft.operators.JsonImport.parseSessions(
        Seq(session("u1", "35.0", "2026-01-01T08:00:00"),
          session("u2", "36.5", "2026-01-01T09:00:00")).toDF("json"), "json")
      .filter(!col("is_corrupt") && col("uid").isNotNull)
      .write.parquet(rawTable)
    def republish(): Unit = {
      val out = ReferencePipeline.run(
        spark.read.parquet(rawTable), "raw_json", Seq("Temp"),
        persistShared = true)
      ReferencePipeline.publish(out, pubDir)
    }
    republish() // healthy baseline publish
    assert(spark.read.parquet(s"$pubDir/admissions").count() === 2)

    // ── crash point 1: INSIDE the swap, between the two renames ─────────
    // AtomicSwap's sequence is tmp fully written → target renamed aside →
    // CRASH. Observable state: target MISSING, the new version whole
    // under .tmp, the previous version whole under __old.
    val adm = new java.io.File(s"$pubDir/admissions")
    val admTmp = new java.io.File(s"$pubDir/admissions.tmp")
    val admOld = new java.io.File(s"$pubDir/admissions__old")
    assert(adm.renameTo(admTmp)) // the fully-written replacement
    new java.io.File(admOld, "part-stale.parquet").getParentFile.mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$admOld/part-stale.parquet"), "old version")
    // the documented no-loss invariant holds AT the crash point: the data
    // is still a readable parquet table under the temp name
    assert(spark.read.parquet(admTmp.getPath).count() === 2)

    // ── crash point 2: mid-WRITE of another table's replacement ─────────
    // a killed Spark write leaves a half-written .tmp beside a still-
    // intact target (this is the StreamUpsert stranded-tmp class, here
    // proven through the pipeline's own publish path)
    val joinedTmp = new java.io.File(s"$pubDir/joined.tmp")
    joinedTmp.mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$joinedTmp/part-garbage"), "half-written")

    // the cron tick just runs the SAME publish again — no special repair
    republish()
    assert(spark.read.parquet(s"$pubDir/admissions").count() === 2)
    assert(spark.read.parquet(s"$pubDir/joined").count() === 2)
    // every crash artifact swept: no stranded .tmp, no stale __old aside
    val leftovers = new java.io.File(pubDir).listFiles().map(_.getName)
      .filter(n => n.endsWith(".tmp") || n.endsWith("__old"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }
}
