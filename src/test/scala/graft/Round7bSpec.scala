package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 second-batch invariants, including the genuinely-streaming
  * watermark key: its memory-sink result must equal the batch
  * recomputation that excludes exactly the late-dropped rows.
  */
class Round7bSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("stream_watermark_late: drops exactly the 3 early days, keeps the rest") {
    val got = q("stream_watermark_late").collect()
      .map(r => r.getTimestamp(0).getTime -> r.getAs[Long]("cnt")).toMap
    val ev = Tables.events(spark, sf)
      .select(col("ts"), expr("unix_date(to_date(ts))").as("day_idx"))
    val mn = ev.agg(min("day_idx")).collect()(0).getInt(0)
    val expect = ev.filter(col("day_idx") >= mn + 3)
      .groupBy(date_trunc("hour", col("ts")).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getAs[Long]("cnt"))
      .toMap
    assert(got === expect)
    // The early-day windows never leaked out of the watermark.
    val cutoffMs = (mn.toLong + 3) * 86400000L
    assert(got.keys.forall(_ >= cutoffMs))
  }

  test("in_subquery_parts equals the semi-join formulation") {
    val got = q("in_subquery_parts").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_items")).toMap
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_size") >= 45)
              .select(col("p_partkey").as("l_partkey")),
            Seq("l_partkey"), "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(got === expect)
  }

  test("not_in_subquery_idle equals the anti-join formulation") {
    val got = q("not_in_subquery_idle").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_unreturned_parts")).toMap
    assert(got.values.sum > 0)
    val expect = Tables.part(spark, sf)
      .join(Tables.lineitem(spark, sf)
              .filter(year(col("l_shipdate")) === 2001 &&
                      col("l_returnflag") === "R")
              .select(col("l_partkey").as("p_partkey")),
            Seq("p_partkey"), "left_anti")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(got === expect)
  }

  test("agg_arg_extremes picks the true extreme customers") {
    val rows = q("agg_arg_extremes").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val seg = r.getString(0)
      val cust = Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === seg)
        .withColumn("ak",
          expr("cast(round(c_acctbal * 100) as bigint)") * lit(10000000L) +
            col("c_custkey"))
        .orderBy(desc("ak")).select("c_name").collect()
      assert(r.getAs[String]("richest") === cust.head.getString(0))
      assert(r.getAs[String]("poorest") === cust.last.getString(0))
    }
  }

  test("win_range_value_frame: band recomputes for sampled rows") {
    val rows = q("win_range_value_frame").collect()
    val byPrio = rows.groupBy(_.getString(1))
    byPrio.foreach { case (_, rs) =>
      val cents = rs.map(_.getAs[Long]("cents")).sorted
      // Spot-check the last row of each priority: count within
      // [c-500000, c] of the max equals its n_in_band.
      val top = rs.maxBy(_.getAs[Long]("cents"))
      val c = top.getAs[Long]("cents")
      val expectN = cents.count(v => v >= c - 500000 && v <= c)
      assert(top.getAs[Long]("n_in_band") === expectN)
    }
  }

  test("join_cross_enum: dense 5x5 grid, totals reconcile") {
    val rows = q("join_cross_enum").collect()
    assert(rows.length === 25)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ===
      Tables.orders(spark, sf).count())
  }

  test("sort_limit_offset is exactly rows 41..60 of the global sort") {
    val page = q("sort_limit_offset").collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("cents")))
    val full = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
              expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .orderBy(desc("cents"), asc("o_orderkey"))
      .limit(60).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("cents")))
    assert(page.toSeq === full.slice(40, 60).toSeq)
  }

  test("llm_lsh_degree_hist: doc mass conserved, handshake parity") {
    val rows = q("llm_lsh_degree_hist").collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === Tables.documents(spark, sf).count())
    // Σ degree·n_docs = 2·|pairs| must be even.
    val mass = rows.map(r =>
      r.getAs[Long]("degree") * r.getAs[Long]("n_docs")).sum
    assert(mass % 2 === 0)
  }
}
