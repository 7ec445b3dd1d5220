package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 third-batch invariants. The Pareto test is the load-bearing
  * one: the bucketed two-pass prefix construction must equal the
  * brute-force global-sort answer exactly, segment by segment.
  */
class Round7cSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("orders_pareto_threshold equals the brute-force global sort") {
    val got = q("orders_pareto_threshold").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_top_customers"), r.getAs[Long]("top_cents"),
         r.getAs[Long]("total_cents"))).toMap
    val rev = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      .collect()
      .groupBy(_.getString(0))
    rev.foreach { case (seg, rows) =>
      val cents = rows.map(r =>
        (r.getAs[Long]("cents"), r.getAs[Long]("o_custkey")))
        .sortBy { case (c, k) => (-c, k) }.map(_._1)
      val total = cents.sum
      var cum = 0L; var n = 0
      while (n < cents.length && 10 * cum < 8 * total) {
        cum += cents(n); n += 1
      }
      val (gotN, gotTop, gotTotal) = got(seg)
      assert(gotTotal === total)
      assert(gotN === n.toLong, s"segment $seg")
      assert(gotTop === cum)
      // Minimality: the top set just crosses 80%.
      assert(10 * cum >= 8 * total && 10 * (cum - cents(n - 1)) < 8 * total)
    }
  }

  test("win_locf_fill carries the latest preceding purchase value") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type", "value").collect()
    val filled = q("win_locf_fill").collect()
      .map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("filled_millis")).toMap
    assert(filled.size === ev.length)
    ev.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r =>
        (r.getAs[java.sql.Timestamp]("ts").getTime,
         r.getAs[Long]("event_id")))
      var last = -1L
      ordered.foreach { r =>
        if (r.getString(3) == "purchase")
          last = math.floor(r.getDouble(4) * 1000).toLong
        assert(filled(r.getAs[Long]("event_id")) === last)
      }
    }
  }

  test("orders_interpurchase: gap count is orders minus first-orders") {
    val rows = q("orders_interpurchase").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_gap_days") <= r.getAs[Long]("max_gap_days"))
      assert(r.getAs[Long]("avg_gap_days") >= 0L)
    }
    val nGaps = rows.map(_.getAs[Long]("n_gaps")).sum
    val o = Tables.orders(spark, sf)
    val expect = o.count() - o.select("o_custkey").distinct().count()
    assert(nGaps === expect)
  }

  test("dt_business_days: closed form equals a day-walk for samples") {
    // The closed form counts weekdays in [od, sd): day x is a weekday
    // iff (x+3) mod 7 < 5 (epoch day 0 = Thursday; +3 → 0 = Monday).
    def busWalk(od: Long, sd: Long): Long =
      (od until sd).count(x => ((x + 3) % 7) < 5).toLong
    def closed(x: Long): Long = 5 * ((x + 3) / 7) + math.min((x + 3) % 7, 5)
    // Property over a spread of spans and weekday phases.
    for (od <- 9490L to 9520L; span <- Seq(0L, 1L, 3L, 7L, 30L, 100L)) {
      val sd = od + span
      assert(closed(sd) - closed(od) === busWalk(od, sd),
        s"od=$od sd=$sd")
    }
    val rows = q("dt_business_days").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      // 5/7 of calendar days, within rounding slack.
      assert(r.getAs[Long]("avg_business_days") <=
        r.getAs[Long]("max_business_days"))
    }
  }
}
