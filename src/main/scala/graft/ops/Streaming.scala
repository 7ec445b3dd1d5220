package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-shaped semantics over the `events` table (SURVEY.md §2.10).
  *
  * Declared queries use batch formulations whose expressions are
  * streaming-identical (`window(...)`, `session_window(...)`,
  * `dropDuplicates` run unchanged under `readStream`); true Structured
  * Streaming equivalence is asserted in ScalaTest (§5 layer 4), since
  * the driver's oracle is batch DuckDB.
  */
object Streaming {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "stream_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
                col("cnt"), col("sum_value"))
        .orderBy("window_start", "event_type")),

    // At-least-once delivery cleanup: dedup by event_id, then count per
    // type. Same `dropDuplicates` runs stateful under readStream.
    "stream_dedup" -> ((s, d) =>
      Tables.events(s, d)
        .dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    // 1-hour windows sliding every 30 minutes: each event lands in two
    // windows; Spark's window() emits both, the oracle unions the two
    // 30-minute-aligned formulations.
    "stream_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("window_start"),
                col("cnt"), col("sum_value"))
        .orderBy("window_start")),

    // Per-user sessions with a 30-minute inactivity gap. Spark's
    // session_window end = last event + gap; the gap-and-island oracle
    // reproduces that as max(ts) + 30 min.
    "stream_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
                col("session_window.start").as("session_start"),
                col("session_window.end").as("session_end"),
                col("n_events"))
        .orderBy("user_id", "session_start"))
  )

  def oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
                count(*) AS cnt, round(sum(value), 2) AS sum_value
         FROM events
         GROUP BY 1, 2
         ORDER BY 1, 2""",

    "stream_dedup" ->
      """SELECT event_type, count(*) AS n
         FROM (SELECT * FROM events
               QUALIFY row_number() OVER (PARTITION BY event_id
                                          ORDER BY ts) = 1)
         GROUP BY event_type
         ORDER BY event_type""",

    "stream_sliding" ->
      """WITH f AS (
           SELECT CAST(ts AS TIMESTAMP) AS ts,
                  date_trunc('hour', ts) +
                    CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                         ELSE INTERVAL 0 MINUTE END AS s0,
                  value
           FROM events
         )
         SELECT window_start, count(*) AS cnt,
                round(sum(value), 2) AS sum_value
         FROM (SELECT s0 AS window_start, value FROM f
               UNION ALL
               SELECT s0 - INTERVAL 30 MINUTE, value FROM f)
         GROUP BY window_start
         ORDER BY window_start""",

    "stream_session" ->
      """WITH e AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
           FROM events
         ),
         flagged AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_session
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ),
         sessions AS (
           SELECT user_id, ts,
                  sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS session_id
           FROM flagged
         )
         SELECT user_id, min(ts) AS session_start,
                max(ts) + INTERVAL 30 MINUTE AS session_end,
                count(*) AS n_events
         FROM sessions
         GROUP BY user_id, session_id
         ORDER BY user_id, session_start"""
  )
}
