package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 second batch: mergeable heavy hitters, XML source, deep
  * recursion. */
class Round8bSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_approx_topk_rollup: merged sketch equals exact at fixture scale") {
    val rows = q("agg_approx_topk_rollup").collect()
    assert(rows.map(_.getAs[Long]("rnk")).toSeq === (1L to rows.length))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("est_exact"),
        s"combined sketch diverged on ${r.getString(1)}")
      assert(r.getAs[Long]("est_cnt") === r.getAs[Long]("exact_cnt"))
    }
    // The single-shot sketch and the accumulate→combine rollup must
    // agree head-for-head (mergeability in action).
    val single = q("agg_approx_topk").collect()
      .map(r => r.getString(1) -> r.getAs[Long]("est_cnt")).toMap
    rows.foreach { r =>
      assert(single(r.getString(1)) === r.getAs[Long]("est_cnt"))
    }
  }

  test("source_xml_roundtrip: XML write/read preserves every record") {
    val got = q("source_xml_roundtrip").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_docs"),
                 r.getAs[Long]("total_chars"), r.getAs[Long]("max_doc_id")))
    val expect = Tables.documents(spark, sf)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum(length(col("text")).cast("long")).as("t"),
           max("doc_id").as("m"))
      .orderBy("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
                 r.getAs[Long]("t"), r.getAs[Long]("m")))
    assert(got === expect)
  }

  test("events_session_window_batch: native sessions match strict-gap algebra") {
    val got = q("events_session_window_batch").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1).getTime,
                 r.getAs[Long]("n_events")))
    // Recompute with the explicit strict->=30min break rule in µs.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, org.apache.spark.sql.expressions.Window.currentRow)
    val expect = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"),
              unix_micros(col("ts")).as("us"))
      .withColumn("brk", when(col("us") - lag("us", 1).over(w) < 1800000000L,
                              0).otherwise(1))
      .withColumn("sid", sum("brk").over(run))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("st"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
                 r.getAs[java.sql.Timestamp]("st").getTime,
                 r.getAs[Long]("n")))
    assert(got.sorted.toSeq === expect.sorted.toSeq)
    // Session totals conserve events.
    assert(got.map(_._3).sum === Tables.events(spark, sf).count())
  }

  test("math_try_funcs: null outcomes counted, never propagated to output") {
    val rows = q("math_try_funcs").collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      Seq("n_div0", "n_mod0", "n_overflow", "n_badcast").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= n, s"$c=$v out of [0,$n]")
      }
      // k is uniform 0..99 in the fixture: every failure class must
      // actually fire somewhere.
      assert(r.getAs[Long]("sum_goodcast") > 0)
    }
    assert(rows.map(_.getAs[Long]("n_overflow")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_div0")).sum > 0)
  }

  test("sql_recursive_series: 24 consecutive months through UnionLoop") {
    val df = q("sql_recursive_series")
    assert(df.queryExecution.optimizedPlan.toString.contains("UnionLoop"))
    val rows = df.collect()
    assert(rows.length === 24)
    assert(rows.map(_.getAs[Int]("month_idx")).toSeq === (1 to 24))
    val months = rows.map(_.getAs[java.sql.Date]("month_start").toLocalDate)
    months.zip(months.tail).foreach { case (a, b) =>
      assert(b === a.plusMonths(1))
    }
    // Month totals agree with the direct aggregate where present.
    val direct = Tables.orders(spark, sf)
      .select(trunc(col("o_orderdate"), "MM").as("m"))
      .groupBy("m").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[java.sql.Date]("m").toLocalDate ->
                r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val m = r.getAs[java.sql.Date]("month_start").toLocalDate
      assert(r.getAs[Long]("n_orders") === direct.getOrElse(m, 0L))
    }
  }
}
