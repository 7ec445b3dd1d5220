package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TTLConfig, ValueState}

/** `transformWithState` sessionizer — Spark 4's arbitrary-stateful
  * API carrying a per-user ValueState across micro-batch boundaries:
  * 30-minute inactivity gap, (ts, event_id) ordering, session
  * ordinals counted per user from 1.
  *
  * DETERMINISM ARGUMENT (what makes a declared, oracle-checked key
  * possible even though per-batch EMISSIONS depend on micro-batch
  * boundaries): within a user, batches arrive in time order under
  * the deterministic file-drain recipe, the state transition is a
  * left fold over (ts, event_id)-sorted rows, and session counts
  * only grow — so the LAST emission per (user, session) equals the
  * fold over the full input regardless of where batch boundaries
  * fell. The converged state is exactly the batch gaps-and-islands
  * answer, which IS DuckDB-expressible.
  */
object SessionizeProcessor {
  /** (sessionId, startSec, lastSec, nEvents) per user. */
  type Sess = (Long, Long, Long, Long)
}

class SessionizeProcessor
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Long, Long)] {
  import SessionizeProcessor.Sess

  @transient private var cur: ValueState[Sess] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cur = getHandle.getValueState[Sess]("cur", Encoders.product[Sess],
                                        TTLConfig.NONE)

  /** Rows: (user, tsSec, eventId), any order within the batch. Emits
    * every session TOUCHED this batch with its state as of batch end;
    * update-mode last-write-wins makes the final emission per session
    * the converged answer (counts only grow).
    */
  override def handleInputRows(user: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long, Long, Long)] = {
    val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
    if (sorted.isEmpty) return Iterator.empty
    var state: Option[Sess] = if (cur.exists()) Some(cur.get()) else None
    val touched = scala.collection.mutable.LinkedHashMap.empty[Long, Sess]
    sorted.foreach { case (_, ts, _) =>
      state = state match {
        case Some((sid, st, last, n)) if ts - last <= 1800 =>
          Some((sid, st, ts, n + 1))
        case Some((sid, _, _, _)) => Some((sid + 1, ts, ts, 1L))
        case None => Some((1L, ts, ts, 1L))
      }
      val s = state.get
      touched(s._1) = s
    }
    cur.update(state.get)
    touched.valuesIterator
      .map { case (sid, st, last, n) => (user, sid, st, last, n) }
      .toSeq.iterator
  }
}
