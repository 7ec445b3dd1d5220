package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 third batch: bitmap-exact distinct, GROUP BY ALL, SQL scalar
  * UDF, parse_url, offset-zone tz conversion. */
class Round8cSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_bitmap_distinct: bitmap popcounts equal exact count(distinct)") {
    val got = q("agg_bitmap_distinct").collect()
      .map(r => (r.getString(0), r.getAs[Long]("distinct_users"))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(got === exact)
    // Two-stage shape: the per-bucket partial means the final agg's
    // input is bucket-grain, not row-grain — no Expand for distinct.
    val plan = q("agg_bitmap_distinct").queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "bitmap path must not plan a distinct Expand")
  }

  test("sql_group_by_all: sugar groups exactly like the explicit form") {
    val got = q("sql_group_by_all").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getAs[Long]("n_events"),
                 r.getAs[Long]("n_users"), r.getAs[Long]("min_event_id")))
    val expect = Tables.events(spark, sf)
      .groupBy(col("event_type"), year(col("ts")).as("y"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("u"),
           min("event_id").as("m"))
      .orderBy("event_type", "y", "n", "u", "m").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getAs[Long]("n"),
                 r.getAs[Long]("u"), r.getAs[Long]("m")))
    assert(got.toSeq === expect.toSeq)
  }

  test("sql_scalar_udf: declarative UDF body is inlined, totals exact") {
    val df = q("sql_scalar_udf")
    // The analyzer inlines CREATE FUNCTION bodies: no ScalaUDF /
    // BatchEvalPython node may appear, the plan is pure expressions.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), "SQL UDF must inline, not plan a UDF call")
    val got = df.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("net_cents")).toMap
    val expect = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
                     * (lit(1.0) + col("l_tax")) * 100 + 0.5).cast("long"))
             .as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("c")).toMap
    assert(got === expect)
  }

  test("str_parse_url: decomposition inverts construction for every doc") {
    val rows = q("str_parse_url").collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("host").endsWith(".example.com"))
      assert(r.getAs[String]("path") === s"/docs/$id")
      val query = r.getAs[String]("query")
      assert(query.startsWith("lang=") && query.contains("&n="))
      assert(query.contains(s"lang=${r.getAs[String]("q_lang")}&"))
    }
  }

  test("dt_tz_offset_convert: +05:30 shift is exact and invertible") {
    val rows = q("dt_tz_offset_convert").collect()
    // Every event round-trips through from_utc -> to_utc unchanged.
    rows.foreach { r =>
      assert(r.getAs[Long]("n_roundtrip_ok") === r.getAs[Long]("n_events"))
    }
    assert(rows.map(_.getAs[Long]("n_events")).sum ===
      Tables.events(spark, sf).count())
    // The shifted hour histogram is the UTC histogram rotated by 5.5h:
    // hour 0 UTC lands at 5:30 IST, so IST hour h collects UTC halves
    // (h-6).5 and (h-5).0 — just assert hours stay in range and all 24
    // buckets exist at fixture scale.
    val hrs = rows.map(_.getInt(0))
    assert(hrs.forall(h => h >= 0 && h <= 23) && hrs.length === 24)
  }
}
