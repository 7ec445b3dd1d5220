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
        .orderBy("event_type"))
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
         ORDER BY event_type"""
  )
}
