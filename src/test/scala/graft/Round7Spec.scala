package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 invariants. The three runtime-optimizer demos are asserted
  * on the PHYSICAL PLAN — the oracle can only check their results, so
  * these tests are what pins the optimizer actually firing: the DPP
  * subquery in the fact scan's partition filters, AQE's skew split on
  * the executed join, and the planner-injected Bloom filter. The rest
  * are algebraic invariants of the new analytics keys.
  */
class Round7Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("scan_dpp_join: dynamic partition pruning subquery in the fact scan") {
    val df = q("scan_dpp_join")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // Only dim-selected years survive (fixture years run 1995..2001;
    // the dim filter keeps <= 1996).
    assert(rows.map(_.getAs[Long]("ship_yr")).forall(_ <= 1996L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning expression in PartitionFilters:\n$plan")
  }

  test("join_skew_aqe: AQE splits the skewed partition, result unchanged") {
    val df = q("join_skew_aqe")
    val got = df.collect().map(r =>
      r.getAs[Long]("k") -> r.getAs[Long]("n_items")).toMap
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected skew=true on the executed sort-merge join:\n$plan")
    // ~3/4 of fact rows collapse onto key 0 by construction.
    val total = got.values.sum
    assert(got(0L) > total / 2)
    // Split+replicate must not change the join result: recompute
    // without any skew tuning on the plain session.
    val fact = Tables.lineitem(spark, sf).select(
      expr("CAST(CASE WHEN l_orderkey % 4 <> 0 THEN 0 " +
           "ELSE l_orderkey % 97 END AS BIGINT)").as("k"))
    val dim = Tables.orders(spark, sf)
      .select(expr("CAST(o_orderkey % 97 AS BIGINT)").as("k")).distinct()
    val expect = fact.join(dim, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("count")).toMap
    assert(got === expect)
  }

  test("join_bloom_runtime: planner injects bloom_filter_might_contain") {
    val df = q("join_bloom_runtime")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // The injected filter prints as might_contain(...) over a
    // bloom_filter_agg scalar subquery in the physical plan.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
      s"expected an injected runtime bloom filter on the fact side:\n$plan")
    // The screen is semantics-free: result equals the plain join.
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
              .filter(col("o_orderpriority") === "1-URGENT" &&
                      col("o_totalprice") > 150000.0),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(rows.map(r =>
      r.getString(0) -> r.getAs[Long]("n_items")).toMap === expect)
  }

  test("llm_bpe_encode: token counts bounded, checksum consistent") {
    val rows = q("llm_bpe_encode").collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (nw, nt, noov, idSum) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("id_sum"))
      assert(nt >= nw)               // char fallback never shrinks a word
      assert(noov <= nw)
      assert(nt >= (nw - noov) + noov)  // each OOV word has >= 1 char
      assert(idSum <= 256L * (nw - noov)) // ids are 1..256, in-vocab only
      assert((noov > 0) || nt === nw) // all in-vocab => 1 token per word
    }
  }

  test("set_intersect_all + set_except_all partition the left multiset") {
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    val inter = q("set_intersect_all").count()
    val except = q("set_except_all").count()
    assert(inter + except === urgent)
  }

  test("events_user_overlap_jaccard: bounds and symmetry-free pairs") {
    val rows = q("events_user_overlap_jaccard").collect()
    assert(rows.nonEmpty && rows.length <= 10) // C(5,2) event types
    rows.foreach { r =>
      val (c, na, nb) = (r.getAs[Long]("n_common"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(r.getString(0) < r.getString(1)) // et_a < et_b, no mirror
      assert(c <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("win_pct_change_daily: basis points recompute exactly") {
    val rows = q("win_pct_change_daily").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, p, bp) = (r.getAs[Long]("n_events"),
        r.getAs[Long]("prev_events"), r.getAs[Long]("pct_change_bp"))
      assert(bp === ((n - p) * 10000) / p) // Scala / truncates like div
    }
  }

  test("llm_doc_simpson: ppm within [0, 1e6), masses reconcile") {
    val rows = q("llm_doc_simpson").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("simpson_ppm")
      assert(ppm >= 0L && ppm < 1000000L)
      assert(r.getAs[Long]("n_distinct_words") <= r.getAs[Long]("n_words"))
    }
  }

  test("orders_priority_aging: mean bounded by max, all priorities present") {
    val rows = q("orders_priority_aging").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_age_days") <= r.getAs[Long]("max_age_days"))
      assert(r.getAs[Long]("avg_age_days") >= 0L)
    }
  }

  test("agg_multi_distinct: distinct counts bounded by row count") {
    q("agg_multi_distinct").collect().foreach { r =>
      val n = r.getAs[Long]("n_orders")
      assert(r.getAs[Long]("n_customers") <= n)
      assert(r.getAs[Long]("n_years") <= 7L)
      assert(r.getAs[Long]("n_statuses") <= 3L)
    }
  }

  test("scan_schema_evolution: both generations survive the merged read") {
    val rows = q("scan_schema_evolution").collect()
    val byLabel = rows.map(r =>
      r.getString(0) -> r.getAs[Long]("n_orders")).toMap
    val o = Tables.orders(spark, sf)
    assert(byLabel("pre-evolution") ===
      o.filter(year(col("o_orderdate")) <= 1997).count())
    assert(byLabel.filterKeys(_ != "pre-evolution").values.sum ===
      o.filter(year(col("o_orderdate")) > 1997).count())
  }
}
