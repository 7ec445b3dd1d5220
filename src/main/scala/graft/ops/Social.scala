package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Social/engagement composites over the events log (SURVEY.md §2.9) —
  * the reference's Instagram-analytics capability class re-expressed on
  * the `events` fixture.
  *
  * Per-type counts use `count(CASE WHEN ...)` (not `sum(CASE ...)`) on
  * both sides: DuckDB's integer SUM returns HUGEINT, which would break
  * type parity with Spark's LongType.
  */
object Social {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // Flagship: per-user engagement — counts by type + total value,
    // top-20 users by activity (deterministic: count then user_id).
    "insta_engagement_by_user" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "signup", 1)).as("n_signup"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          round(sum("value"), 2).as("total_value"))
        .orderBy(desc("n_events"), asc("user_id"))
        .limit(20))
  )

  def oracles: Map[String, String] = Map(
    "insta_engagement_by_user" ->
      """SELECT user_id, count(*) AS n_events,
                count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
                count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
                count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
                count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
                count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
                round(sum(value), 2) AS total_value
         FROM events
         GROUP BY user_id
         ORDER BY n_events DESC, user_id
         LIMIT 20"""
  )
}
