package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forward-fill (LOCF): the continuous twin of
  * [[graft.operators.Windows.forwardFill]] — NULL readings are replaced
  * by the key's most recent non-NULL observation, with the observation
  * carried ACROSS micro-batches in per-key state.
  *
  * Ordering semantics: within a micro-batch each key's rows are sorted
  * by (ts, event_id) before folding, so intra-batch order matches the
  * batch twin exactly. Across batches the carried observation only ever
  * moves FORWARD (a late row older than the carried observation is
  * filled with the newer value, and a late non-NULL observation older
  * than the carried one does not regress the state) — the standard
  * at-arrival LOCF approximation under disorder; route late data through
  * the batch twin when exact event-order fills matter.
  *
  * Scale notes: state is ONE (ts, event_id, value) triple per key —
  * constant size, not per-event. `ProcessingTimeTimeout` with
  * `stateTtlMs` expires keys idle longer than the TTL (their next
  * reading simply starts unfilled), bounding state for unbounded key
  * universes; pass 0 to keep state forever (bounded key sets).
  */
object StreamFill {

  case class Reading(user_id: Long, ts: Timestamp, event_id: Long,
                     value: Option[Double])

  case class LastObs(tsMs: Long, eventId: Long, value: Double)

  case class Filled(user_id: Long, ts: Timestamp, event_id: Long,
                    value_filled: Option[Double], was_filled: Boolean)

  def fill(readings: Dataset[Reading], stateTtlMs: Long = 0L): Dataset[Filled] = {
    import readings.sparkSession.implicits._

    def fold(userId: Long, rows: Iterator[Reading],
             state: GroupState[LastObs]): Iterator[Filled] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
        var obs = state.getOption
        val out = sorted.map { r =>
          r.value match {
            case Some(v) =>
              // only advance — a late observation never regresses state
              val newer = obs.forall(o =>
                o.tsMs < r.ts.getTime ||
                  (o.tsMs == r.ts.getTime && o.eventId < r.event_id))
              if (newer) obs = Some(LastObs(r.ts.getTime, r.event_id, v))
              Filled(userId, r.ts, r.event_id, Some(v), was_filled = false)
            case None =>
              Filled(userId, r.ts, r.event_id, obs.map(_.value),
                was_filled = obs.nonEmpty)
          }
        }
        obs.foreach(state.update)
        if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
        out.iterator
      }
    }

    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    readings.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fold)
  }
}
