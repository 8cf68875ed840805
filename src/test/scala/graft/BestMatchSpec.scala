package graft

import org.apache.spark.sql.functions._
import graft.operators.{Joins, Cleanup, DeriveColumns}
import graft.pipeline.ReferencePipeline

/** Best-match duplicate resolution (reference: create_joined_table_and_
  * derived_columns.py calculate_match_score / resolve_duplicate_matches):
  * operator semantics, the clinical score formula, and the pipeline
  * wiring that keeps a multi-discharge uid from inflating `joined`.
  */
class BestMatchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val adm = Seq(
    // picks the closer-OFC candidate
    ("u1", "F1", "34", "38", "2500"),
    // every field null/garbage → all candidates score −1 → keep-first
    ("u2", "F1", null, "oops", null),
    // no candidate at all → survives null-padded
    ("u3", "F2", "30", "30", "1500")
  ).toDF("uid", "facility", "ofc", "gest", "bw")

  private lazy val dis = Seq(
    ("u1", "F1", "d_far", "40", "38", "2500", 1),
    ("u1", "F1", "d_near", "35", "38", "2500", 2),
    ("u2", "F1", "d_b", null, null, null, 2),
    ("u2", "F1", "d_a", null, null, null, 1)
  ).toDF("uid", "facility", "did", "ofc", "gest", "bw", "seq")

  private def score(j: org.apache.spark.sql.DataFrame) = Joins.matchScore(Seq(
    (col("ofc"), col("ofc_r"), 10.0, 1.0),
    (col("gest"), col("gest_r"), 10.0, 1.0),
    (col("bw"), col("bw_r"), 5.0, 500.0)))

  private lazy val resolved = Joins.bestMatch(adm, dis,
    on = Seq("uid", "facility"), leftId = Seq("uid"),
    score = score, keepFirstBy = _ => col("seq"))

  test("exactly one output row per left row — a multi-match right cannot inflate the left") {
    assert(resolved.count() === adm.count())
    assert(resolved.select("uid").distinct().count() === 3)
  }

  test("the highest-scoring candidate wins") {
    // u1: d_near scores 10−1 (ofc) + 10 (gest) + 5 (bw) = 24 vs d_far 19
    val r = resolved.filter(col("uid") === "u1").select("did").as[String].head()
    assert(r === "d_near")
  }

  test("all-scores-−1 falls back to keep-first by the tie key") {
    // u2: no comparable field on either candidate → both −1 → min seq
    val r = resolved.filter(col("uid") === "u2").select("did").as[String].head()
    assert(r === "d_a")
  }

  test("an unmatched left row survives with null right columns") {
    val r = resolved.filter(col("uid") === "u3").select("did").head()
    assert(r.isNullAt(0))
  }

  test("matchScore mirrors calculate_match_score branch by branch") {
    val df = Seq(
      ("10", "12", "30", "40", "2000", "3000"), // 8 + 0 + 3 = 11
      ("x", null, "30", "30", null, "1000"),    // gest only → 10
      (null, "5", "oops", "nan", "", "1")       // nothing comparable → −1
    ).toDF("a1", "b1", "a2", "b2", "a3", "b3")
    val got = df.select(Joins.matchScore(Seq(
      (col("a1"), col("b1"), 10.0, 1.0),
      (col("a2"), col("b2"), 10.0, 1.0),
      (col("a3"), col("b3"), 5.0, 500.0))).as("s")).as[Double].collect().toSeq
    assert(got === Seq(11.0, 10.0, -1.0))
  }

  test("score ties resolve to the smallest tie key (reference idxmax-first semantics)") {
    val a = Seq(("k", "10")).toDF("uid", "v")
    val b = Seq(("k", "10", 7), ("k", "10", 3)).toDF("uid", "v", "seq")
    val r = Joins.bestMatch(a, b, Seq("uid"), Seq("uid"),
      _ => Joins.matchScore(Seq((col("v"), col("v_r"), 10.0, 1.0))),
      _ => col("seq"))
    assert(r.select("seq").as[Int].head() === 3)
  }

  // ── pipeline wiring ────────────────────────────────────────────────────

  private def session(uid: String, script: String, started: String,
                      ofc: String, extraDate: String = ""): String = {
    val dateEntry = if (extraDate.isEmpty) ""
      else s""",{"key":"DateDischarge","values":[{"value":"$extraDate","label":"D"}]}"""
    s"""{"scriptid":"$script","facility":"F1","uid":"$uid",
        "started_at":"$started","completed_at":"$started",
        "entries":[{"key":"OFC","values":[{"value":"$ofc","label":"OFC"}]}$dateEntry]}"""
      .replaceAll("\n\\s*", "")
  }

  test("rename-collision guards refuse BOTH a left and a right pre-existing target") {
    val l = Seq(("u1", "x", "y")).toDF("uid", "v", "v_r")
    val r1 = Seq(("u1", "z")).toDF("uid", "v")
    // left already has v_r → renaming right v to v_r would be ambiguous
    intercept[IllegalArgumentException] {
      Joins.bestMatch(l, r1, Seq("uid"), Seq("uid"),
        _ => lit(-1.0), _ => lit(1))
    }
    // right has BOTH v and v_r, left has only v: renaming right v to v_r
    // lands on the unrenamed right v_r — must refuse too
    val l2 = Seq(("u1", "x")).toDF("uid", "v")
    val r2 = Seq(("u1", "z", "w")).toDF("uid", "v", "v_r")
    intercept[IllegalArgumentException] {
      Joins.bestMatch(l2, r2, Seq("uid"), Seq("uid"),
        _ => lit(-1.0), _ => lit(1))
    }
    // a different suffix sidesteps both collisions
    val out = Joins.bestMatch(l2, r2, Seq("uid"), Seq("uid"),
      _ => lit(-1.0), _ => lit(1), rightSuffix = "_dis")
    assert(out.columns.toSeq.map(_.toLowerCase).sorted ===
      Seq("uid", "v", "v_dis", "v_r"))
  }

  test("pipeline: a multi-discharge uid resolves to the clinically closest discharge") {
    // two DIFFERENT discharges share uid u1 → KeyRepair gives them
    // distinct keys (u1#date); the base-uid join sees BOTH as candidates
    // for u1's admission and bestMatch keeps the closer OFC
    val raw = Seq(
      session("u1", "adm", "2026-01-01T08:00:00", "34"),
      session("u1", "dis", "2026-01-03T08:00:00", "39", "2026-01-03"),
      session("u1", "dis", "2026-01-04T09:00:00", "35", "2026-01-04"),
      session("u2", "adm", "2026-01-02T08:00:00", "31")
    ).toDF("json")
    val out = ReferencePipeline.run(raw, "json", Seq("OFC"))
    // joined row count equals admission count — no inflation
    assert(out.joined.count() === out.admissions.count())
    val u1 = out.joined.filter(col("uid") === "U1")
      .select(col(s"OFC_value${ReferencePipeline.DischargeSuffix}")).as[String].head()
    assert(u1 === "35")
    // u2 has no discharge → still present, flagged
    assert(out.joined.filter(col("uid") === "U2")
      .select("no_discharge").head().getInt(0) === 1)
  }

  test("pipeline: a NULL facility still matches its discharge (pandas NaN-key merge semantics)") {
    def bare(uid: String, script: String, started: String): String =
      s"""{"scriptid":"$script","uid":"$uid",
          "started_at":"$started","completed_at":"$started",
          "entries":[{"key":"OFC","values":[{"value":"34","label":"OFC"}]}]}"""
        .replaceAll("\n\\s*", "")
    val raw = Seq(
      bare("u4", "adm", "2026-01-01T08:00:00"),
      bare("u4", "dis", "2026-01-03T08:00:00")
    ).toDF("json")
    val out = ReferencePipeline.run(raw, "json", Seq("OFC"))
    val r = out.joined.select("no_discharge", "los_days").head()
    assert(r.getInt(0) === 0, "null-facility admission lost its discharge")
    assert(r.getInt(1) === 2)
  }

  test("pipeline: all-candidates-incomparable keeps the first discharge by start time") {
    val raw = Seq(
      session("u5", "adm", "2026-01-01T08:00:00", "garbage"),
      session("u5", "dis", "2026-01-09T08:00:00", "39", "2026-01-09"),
      session("u5", "dis", "2026-01-03T08:00:00", "35", "2026-01-03")
    ).toDF("json")
    val out = ReferencePipeline.run(raw, "json", Seq("OFC"))
    assert(out.joined.count() === 1L)
    val kept = out.joined
      .select(col(s"OFC_value${ReferencePipeline.DischargeSuffix}")).as[String].head()
    assert(kept === "35") // earliest discharge start wins when scores are −1
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the latest at-or-before right row, max tie on equal timestamps") {
    val l = Seq(
      (1L, "k1", ts("2026-01-01 10:00:00")), // after r10/r11, before r12
      (2L, "k1", ts("2026-01-01 09:00:00")), // EQUAL to r10/r11's ts
      (3L, "k1", ts("2026-01-01 08:59:59")), // before every right row
      (4L, "k2", ts("2026-01-01 10:00:00")), // key with no right rows
      (5L, null, ts("2026-01-01 10:00:00")), // null key never matches
      (6L, "k1", null)                       // null ts never matches
    ).toDF("id", "k", "t")
    val r = Seq(
      (10L, "k1", ts("2026-01-01 09:00:00"), 1.0),
      (11L, "k1", ts("2026-01-01 09:00:00"), 2.0), // same ts: max rid wins
      (12L, "k1", ts("2026-01-01 11:00:00"), 3.0),
      (13L, null, ts("2026-01-01 09:30:00"), 9.9)  // null-key right dropped
    ).toDF("rid", "k", "t", "v")
    val out = Joins.asOf(l, r, Seq("k"), "t", "t", Seq("rid", "v"), tieCol = "rid")
      .select("id", "asof_rid", "asof_v").as[(Long, Option[Long], Option[Double])]
      .collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(out(1L) === ((Some(11L), Some(2.0)))) // latest <= 10:00 is 09:00, tie → 11
    assert(out(2L) === ((Some(11L), Some(2.0)))) // equal ts matches (<=)
    assert(out(3L) === ((None, None)))
    assert(out(4L) === ((None, None)))
    assert(out(5L) === ((None, None)))
    assert(out(6L) === ((None, None)))
  }

  test("asOf matches keys case-insensitively, like column resolution does") {
    // col("K") RESOLVES against physical k, so the payload-nulling pass
    // must not treat the differently-cased key as a payload column (that
    // silently nulled the right side's key and unmatched every row)
    val l = Seq((1L, "k1", ts("2026-01-01 10:00:00"))).toDF("id", "k", "t")
    val r = Seq((10L, "k1", ts("2026-01-01 09:00:00"), 1.0)).toDF("rid", "k", "t", "v")
    val out = Joins.asOf(l, r, Seq("K"), "t", "t", Seq("v"), tieCol = "rid")
      .select("asof_v").head()
    assert(out.getDouble(0) === 1.0)
  }

  test("asOf tolerance turns too-old matches into no-match") {
    val l = Seq((1L, "k", ts("2026-01-01 12:00:00"))).toDF("id", "k", "t")
    val r = Seq((7L, "k", ts("2026-01-01 09:00:00"), 1.0)).toDF("rid", "k", "t", "v")
    val hit = Joins.asOf(l, r, Seq("k"), "t", "t", Seq("v"), tieCol = "rid",
      tolerance = Some(expr("INTERVAL 4 HOUR"))).select("asof_v").head()
    val miss = Joins.asOf(l, r, Seq("k"), "t", "t", Seq("v"), tieCol = "rid",
      tolerance = Some(expr("INTERVAL 2 HOUR"))).select("asof_v").head()
    assert(hit.getDouble(0) === 1.0)
    assert(miss.isNullAt(0))
    // matched-ts column comes back too, for audit/debug
    val tsCol = Joins.asOf(l, r, Seq("k"), "t", "t", Seq("v"), tieCol = "rid")
      .select("asof_t").head().getTimestamp(0)
    assert(tsCol === ts("2026-01-01 09:00:00"))
  }

  test("rangeJoin matches points to overlapping intervals across bucket boundaries") {
    // bucket width 60 s; the interval crosses two buckets, and points sit
    // on the exact bounds (inclusive both ends), outside, and in a
    // different key
    val pts = Seq(
      (1L, "k1", ts("2026-01-01 10:00:30")), // inside
      (2L, "k1", ts("2026-01-01 10:01:30")), // inside, NEXT bucket
      (3L, "k1", ts("2026-01-01 10:00:00")), // == start
      (4L, "k1", ts("2026-01-01 10:02:00")), // == end
      (5L, "k1", ts("2026-01-01 10:02:01")), // just after
      (6L, "k2", ts("2026-01-01 10:00:30"))  // wrong key
    ).toDF("pid", "k", "t")
    val ivs = Seq(
      ("i1", "k1", ts("2026-01-01 10:00:00"), ts("2026-01-01 10:02:00")),
      ("bad", "k1", ts("2026-01-01 11:00:00"), ts("2026-01-01 10:00:00")) // end<start
    ).toDF("iid", "k", "s", "e")
    val out = Joins.rangeJoin(pts, ivs, Seq("k"), "t", "s", "e", bucketWidthSec = 60)
      .select("pid", "iid").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "i1"), (2L, "i1"), (3L, "i1"), (4L, "i1")))
  }

  test("rangeJoin keyless form pairs every point with every overlapping interval") {
    val pts = Seq((1L, ts("2026-01-01 10:00:30"))).toDF("pid", "t")
    val ivs = Seq(
      ("a", ts("2026-01-01 10:00:00"), ts("2026-01-01 10:01:00")),
      ("b", ts("2026-01-01 09:59:00"), ts("2026-01-01 10:30:00")),
      ("c", ts("2026-01-01 10:01:00"), ts("2026-01-01 10:02:00"))
    ).toDF("iid", "s", "e")
    val out = Joins.rangeJoin(pts, ivs, Seq.empty, "t", "s", "e", bucketWidthSec = 60)
      .select("iid").as[String].collect().toSet
    assert(out === Set("a", "b"))
  }

  test("rangeJoin fails loudly on an interval exceeding maxSpanBuckets") {
    val pts = Seq((1L, ts("2026-01-01 10:00:30"))).toDF("pid", "t")
    val ivs = Seq(("open", ts("2026-01-01 00:00:00"), ts("2026-12-31 00:00:00")))
      .toDF("iid", "s", "e")
    val e = intercept[Exception] {
      Joins.rangeJoin(pts, ivs, Seq.empty, "t", "s", "e",
        bucketWidthSec = 60, maxSpanBuckets = 100).count()
    }
    assert(e.getMessage != null) // raise_error propagates; pairs never explode
  }

  test("asOf refuses colliding output columns") {
    val l = Seq((1L, "k", ts("2026-01-01 12:00:00"), 0.0)).toDF("id", "k", "t", "asof_v")
    val r = Seq((7L, "k", ts("2026-01-01 09:00:00"), 1.0)).toDF("rid", "k", "t", "v")
    intercept[IllegalArgumentException] {
      Joins.asOf(l, r, Seq("k"), "t", "t", Seq("v"), tieCol = "rid")
    }
    intercept[IllegalArgumentException] { // rightTs repeated in payload
      Joins.asOf(l.drop("asof_v"), r, Seq("k"), "t", "t", Seq("t", "v"), tieCol = "rid")
    }
  }
}
