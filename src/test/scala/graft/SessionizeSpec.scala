package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Evt, SessionOut}

/** Streaming sessionization: flatMapGroupsWithState + event-time timeout,
  * checked against the batch twin (q33) on identical data.
  */
class SessionizeSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streaming sessions close on gap and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[Evt]
    val sessions = Sessionize.sessions(in.toDS(), gapSeconds = 600) // 10 min gap
    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .outputMode("append")
      .start()

    // user 1: two events 5 min apart (one session), then 20 min silence → new session
    in.addData(
      Evt(1L, ts(0), 1), Evt(1L, ts(5), 2),
      Evt(1L, ts(25), 3),
      Evt(2L, ts(1), 4))
    q.processAllAvailable()
    // advance the watermark far past every open session's gap horizon so
    // EventTimeTimeout flushes them (no-data micro-batches fire timeouts)
    in.addData(Evt(99L, ts(59), 100))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_out").as[SessionOut].collect()
      .map(s => (s.user_id, s.session_idx, s.session_start, s.session_end, s.n_events))
      .toSet
    // user 1 session 0 closed by the gap; session 1 and user 2's closed by timeout
    assert(out.contains((1L, 0L, ts(0), ts(5), 2L)))
    assert(out.contains((1L, 1L, ts(25), ts(25), 1L)))
    assert(out.contains((2L, 0L, ts(1), ts(1), 1L)))
  }

  test("a late-but-within-watermark event LOWERS session_start (batch-twin parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Sessionize.sessions(in.toDS(), gapSeconds = 600).writeStream
      .format("memory").queryName("sess_late").outputMode("append").start()
    in.addData(Evt(1L, ts(10), 1)) // session opens at 10:10
    q.processAllAvailable()        // watermark trails by the 10-min delay
    // out-of-order event BEFORE the open session's start, above watermark:
    // must merge AND pull start back, like the batch twin's min(ts)
    in.addData(Evt(1L, ts(5), 2))
    q.processAllAvailable()
    in.addData(Evt(99L, ts(59), 100)) // flush via watermark timeout
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_late").as[SessionOut].collect()
      .filter(_.user_id == 1L)
      .map(s => (s.session_start, s.session_end, s.n_events)).toSet
    assert(out === Set((ts(5), ts(10), 2L)))
  }

  test("an event BEYOND the watermark is dropped, not resurrected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Sessionize.sessions(in.toDS(), gapSeconds = 600).writeStream
      .format("memory").queryName("sess_drop").outputMode("append").start()
    in.addData(Evt(1L, ts(10), 1))
    q.processAllAvailable()
    // advance the watermark far past ts(10)+gap: user 1's session flushes
    in.addData(Evt(99L, ts(50), 2))
    q.processAllAvailable()
    // ts(5) is far below the watermark (≈10:40) — the stateful operator
    // must FILTER it before the fold: no new session, no mutation of the
    // already-emitted one (the append-mode contract: emitted rows are
    // final; resurrecting state for sub-watermark rows would emit a
    // duplicate (user, idx) key or a second session the batch twin,
    // which sees all data at once, would never produce)
    in.addData(Evt(1L, ts(5), 3))
    q.processAllAvailable()
    in.addData(Evt(99L, Timestamp.valueOf("2026-01-01 13:00:00"), 4)) // flush all
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sess_drop").as[SessionOut].collect()
      .filter(_.user_id == 1L)
      .map(s => (s.session_idx, s.session_start, s.n_events)).toSet
    assert(u1 === Set((0L, ts(10), 1L)), s"late event leaked into: $u1")
  }

  test("session numbering continues after a timeout flush (no duplicate keys)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Evt]
    val q = Sessionize.sessions(in.toDS(), gapSeconds = 600).writeStream
      .format("memory").queryName("sess_idx").outputMode("append").start()
    in.addData(Evt(1L, ts(0), 1))
    q.processAllAvailable()
    // watermark far past the gap horizon → session 0 flushes on timeout
    in.addData(Evt(99L, ts(30), 2))
    q.processAllAvailable()
    // user 1 returns AFTER their session was flushed: must be idx 1, not 0
    in.addData(Evt(1L, ts(40), 3))
    q.processAllAvailable()
    // flush the second session too (watermark must pass ts(40)+gap)
    in.addData(Evt(99L, Timestamp.valueOf("2026-01-01 12:00:00"), 4))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sess_idx").filter($"user_id" === 1L)
      .select("session_idx", "n_events").as[(Long, Long)].collect().toSet
    assert(u1 == Set((0L, 1L), (1L, 1L)), s"got $u1")
  }

  test("streaming sessions agree with the q33 batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // deterministic synthetic stream: 3 users, gaps straddling 30 min
    val evts = for {
      u <- 1L to 3L
      i <- 0 until 12
    } yield Evt(u, new Timestamp(ts(0).getTime + u * 60000L + i * i * 310000L), u * 100 + i)

    val in = MemoryStream[Evt]
    val q = Sessionize.sessions(in.toDS(), gapSeconds = 1800).writeStream
      .format("memory").queryName("sess_twin")
      .outputMode("append")
      .start()
    in.addData(evts: _*)
    q.processAllAvailable()
    // push the watermark past everything so every session flushes
    in.addData(Evt(999L, new Timestamp(ts(0).getTime + 86400000L), 9999L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_twin")
      .filter($"user_id" =!= 999L)
      .select("user_id", "session_idx", "session_start", "session_end", "n_events")
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSet

    // batch twin: same gap logic via window functions (q33's shape)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = evts.toDF("user_id", "ts", "event_id")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val newSess = when(unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)) > 1800, 1L)
      .otherwise(lit(0L))
    val batch = df.withColumn("__new", coalesce(newSess, lit(0L)))
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSet

    assert(streamed == batch)
  }
}
