package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 seventh-batch invariants. */
class Round7gSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("events_sliding_distinct_sketch: exact counts match brute force, envelope holds") {
    val rows = q("events_sliding_distinct_sketch").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_5pct"),
      s"sketch escaped the 5% envelope on ${r.get(0)}"))
    // Brute-force trailing-7-day distinct per day.
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id")).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1))
    val days = ev.map(_._1)
    val (mn, mx) = (days.min, days.max)
    val got = rows.map(r =>
      r.getDate(0).toLocalDate -> r.getAs[Long]("exact_users_7d")).toMap
    got.keys.foreach { day =>
      val lo = day.minusDays(6)
      val expect = ev.filter { case (d0, _) =>
        !d0.isBefore(lo) && !d0.isAfter(day)
      }.map(_._2).distinct.size.toLong
      assert(got(day) === expect, s"day $day")
    }
    assert(got.keySet.min === mn && got.keySet.max === mx)
    // Monotone start: day mn's window is just day mn itself.
    val day1 = ev.filter(_._1 == mn).map(_._2).distinct.size.toLong
    assert(got(mn) === day1)
  }

  test("events_sliding_distinct_sketch: union runs over sketch rows, not facts") {
    val p = q("events_sliding_distinct_sketch")
      .queryExecution.executedPlan.toString
    assert(p.contains("hll_union_agg") && p.contains("hll_sketch_agg"))
  }
}
