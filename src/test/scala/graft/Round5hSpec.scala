package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 eighth-batch invariants: the power-user cut is exactly
  * ⌈1%⌉ with shares consistent, session-depth and bounce counts
  * reconcile with the sessionize key, and the weekday matrix
  * partitions all events with normalized rows.
  */
class Round5hSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("insta_power_users: cut size = max(1, users/100); ranks dense; shares sum < 1") {
    val top = q("insta_power_users").collect()
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(top.length === math.max(1L, nUsers / 100).toInt)
    assert(top.map(_.getAs[Long]("rk")).sorted.toSeq ===
      (1L to top.length).toSeq)
    val shares = top.map(_.getAs[Double]("share"))
    assert(shares.forall(s => s > 0 && s <= 1) && shares.sum <= 1.0 + 1e-6)
  }

  test("insta_session_depth and insta_bounce_rate reconcile with events_sessionize") {
    val sess = q("events_sessionize")
    val depth = q("insta_session_depth")
    val bounce = q("insta_bounce_rate")
    val nSessions = sess.count()
    assert(depth.agg(sum("n_sessions")).head.getLong(0) === nSessions)
    assert(bounce.agg(sum("n_sessions")).head.getLong(0) === nSessions)
    val singles = sess.filter(col("n_events") === 1).count()
    assert(bounce.agg(sum("n_bounce")).head.getLong(0) === singles)
    val depth1 = depth.filter(col("depth_bucket") === 1)
      .agg(coalesce(sum("n_sessions"), lit(0L))).head.getLong(0)
    assert(depth1 === singles)
  }

  test("events_dow_hour_matrix: covers all events, rows normalize, dow in 0..6") {
    val m = q("events_dow_hour_matrix")
    assert(m.agg(sum("n_events")).head.getLong(0) ===
      Tables.events(spark, sf).count())
    assert(m.filter(col("dow") < 0 || col("dow") > 6 ||
      col("hr") < 0 || col("hr") > 23).count() === 0)
    m.collect().groupBy(_.getAs[Long]("dow")).foreach { case (dow, rows) =>
      val s = rows.map(_.getAs[Double]("dow_share")).sum
      assert(math.abs(s - 1.0) < 5e-3, s"dow $dow shares sum to $s")
    }
  }
}
