package graft

import java.nio.file.Files
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TTLConfig, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** `transformWithState` — Spark 4's arbitrary-stateful-streaming API
  * (the §2.10 surface no declared key exercises, since its output
  * depends on micro-batch boundaries and so has no engine-independent
  * DuckDB oracle). Closure here: a custom sessionizer whose per-user
  * ValueState survives a batch boundary must converge to EXACTLY the
  * batch `events_sessionize` answer — same 30-minute gap rule, same
  * (ts, event_id) ordering, same session ordinals.
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

class TransformWithStateSpec extends AnyFunSuite {
  import TestSpark._

  test("transformWithState sessionization equals batch events_sessionize") {
    // Deterministic two-batch split on the day axis (the
    // stream_watermark_late recipe): batch 2 is strictly later than
    // batch 1 per user, so cross-batch sessions exercise the
    // ValueState handoff. transformWithState requires the RocksDB
    // state store; isolate it (and small state partitioning) on a
    // child session.
    val s2: SparkSession = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._

    val root = Files.createTempDirectory("tws").toFile.getAbsolutePath
    val ev = Tables.events(s2, sf)
      .select(col("user_id"),
              unix_timestamp(date_trunc("second", col("ts"))).as("ts_s"),
              col("event_id"),
              expr("unix_date(to_date(ts))").as("day_idx"))
    val bounds = ev.agg(min("day_idx").as("mn"), max("day_idx").as("mx"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("late", col("day_idx") >= (col("mn") + col("mx")) / 2)
      .select("user_id", "ts_s", "event_id", "late")
    tagged.filter(!col("late")).drop("late")
      .coalesce(1).write.mode("overwrite").parquet(root + "/f1")

    val sessions = s2.readStream
      .schema("user_id LONG, ts_s LONG, event_id LONG")
      .parquet(root + "/f*")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionizeProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "session_id", "start_s", "last_s", "n_events")
    val qy = sessions.writeStream.outputMode("update")
      .format("memory").queryName("tws_sessions").start()
    try {
      qy.processAllAvailable()
      tagged.filter(col("late")).drop("late")
        .coalesce(1).write.mode("overwrite").parquet(root + "/f2")
      qy.processAllAvailable()
    } finally qy.stop()

    // Last emission per (user, session) is the converged state.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "session_id").orderBy(desc("n_events"))
    val got = s2.table("tws_sessions")
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("user_id"), col("session_id"), col("n_events"),
              col("start_s"), (col("last_s") - col("start_s")).as("dur_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet

    val expect = SparkEntry.queries("events_sessionize")(s2, sf)
      .select(col("user_id"), col("session_id"), col("n_events"),
              unix_timestamp(col("start_ts")).as("start_s"), col("dur_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet

    assert(got === expect)
    s2.catalog.dropTempView("tws_sessions")
  }
}
