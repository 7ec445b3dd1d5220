package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Layer-2 unit tests (SURVEY §5): every declared query runs on
  * sf0.001 and returns a sane shape; spot values checked against
  * fixture domains (FIXTURES.md).
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query key has runnable plan and rows on sf0.001") {
    // Keys whose correct result is empty on the small fixtures (every
    // customer has orders, so anti/except legitimately yield nothing).
    val mayBeEmpty = Set("join_anti", "set_except")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key is a declared query") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracles without queries: $undeclared")
  }

  test("scan_count equals fixture row count") {
    val n = SparkEntry.queries("scan_count")(spark, sf).collect()(0).getLong(0)
    assert(n == 6000L)
  }

  test("agg_pricing_summary has 6 flag/status groups") {
    val rows = SparkEntry.queries("agg_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(0)).toSet == Set("A", "N", "R"))
  }

  test("win_rank_topk yields exactly 5 per returnflag (unique tiebreak)") {
    val rows = SparkEntry.queries("win_rank_topk")(spark, sf).collect()
    assert(rows.length == 15)
  }

  test("insta_engagement_by_user per-type counts sum to n_events") {
    SparkEntry.queries("insta_engagement_by_user")(spark, sf).collect()
      .foreach { r =>
        val total = r.getLong(1)
        val parts = (2 to 6).map(r.getLong).sum
        assert(parts == total, s"row $r")
      }
  }

  test("events loader converts ns ts to microsecond timestamps in 2024-01") {
    val ts = Tables.events(spark, sf).selectExpr("min(ts)", "max(ts)").collect()(0)
    assert(ts.getTimestamp(0).toString.startsWith("2024-01-01"))
    assert(ts.getTimestamp(1).toString.startsWith("2024-01-3"))
  }
}
