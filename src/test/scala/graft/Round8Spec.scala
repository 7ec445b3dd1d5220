package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 invariants: the Variant/recursive-CTE/approx_top_k/map-HOF/
  * interval batch, plus plan-shape guards for this round's re-plans
  * (vocab top-k as TakeOrderedAndProject, PageRank lineage cut).
  */
class Round8Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sql_recursive_reach: executes through UnionLoop and equals explicit BFS") {
    val df = q("sql_recursive_reach")
    val got = df.collect()
      .map(r => (r.getAs[Long]("src_id"),
                 r.getAs[Long]("n_reach3"), r.getAs[Long]("n_paths3")))
    assert(got.nonEmpty)
    // The recursion must run through Spark's loop operator, not some
    // unrolled rewrite.
    val lp = df.queryExecution.optimizedPlan.toString
    assert(lp.contains("UnionLoop"),
      s"expected UnionLoop in the optimized plan:\n$lp")
    // Explicit 3-round BFS over the same edge view (registered by the
    // key above) must agree path-for-path.
    val edges = spark.table("graft_knn_edges_r8")
    var frontier = edges.select(col("src_id"), col("dst_id"),
                                lit(1).as("depth"))
    var all = frontier
    for (_ <- 2 to 3) {
      frontier = frontier.join(
          edges.select(col("src_id").as("m"), col("dst_id").as("nd")),
          col("dst_id") === col("m"))
        .select(col("src_id"), col("nd").as("dst_id"),
                (col("depth") + 1).as("depth"))
      all = all.unionAll(frontier)
    }
    val expect = all.groupBy("src_id")
      .agg(countDistinct("dst_id").as("r"), count(lit(1)).as("p"))
      .collect()
      .map(r => (r.getAs[Long]("src_id"),
                 r.getAs[Long]("r"), r.getAs[Long]("p")))
    assert(got.sorted === expect.sorted)
  }

  test("variant_parse_extract: codegen'd variant path, no UDF, values match direct") {
    val df = q("variant_parse_extract")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("variant_get"),
      s"expected native variant_get in the physical plan:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      "variant extraction must not fall back to a UDF")
    val got = df.collect().map(r => (r.getString(0), r.getAs[Long]("n_events"),
      r.getAs[Long]("sum_k"), r.getAs[Long]("max_k"), r.getAs[Long]("sum_fv")))
    val expect = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(expr("cast(get_json_object(props, '$.k') as bigint)")).as("sk"),
           max(expr("cast(get_json_object(props, '$.k') as bigint)")).as("mk"),
           sum(floor(col("value"))).as("sf"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("sk"),
                 r.getAs[Long]("mk"), r.getAs[Long]("sf")))
    assert(got === expect)
  }

  test("variant_mixed_schema: heterogeneous shapes split cleanly") {
    val rows = q("variant_mixed_schema").collect()
    val byShape = rows.map(r => r.getString(0) -> r).toMap
    assert(byShape.keySet === Set("OBJECT<x: BIGINT, y: VOID>",
                                  "OBJECT<x: STRING, y: VOID>"))
    val num = byShape("OBJECT<x: BIGINT, y: VOID>")
    val str = byShape("OBJECT<x: STRING, y: VOID>")
    // Typed extraction succeeds exactly on the numeric shape; the JSON
    // null under $.y is variant-null on every row of both shapes.
    assert(num.getAs[Long]("n_typed") === num.getAs[Long]("n_rows"))
    assert(str.getAs[Long]("n_typed") === 0L)
    assert(str.getAs[Long]("sum_x") === 0L)
    rows.foreach(r => assert(
      r.getAs[Long]("n_variant_null") === r.getAs[Long]("n_rows")))
  }

  test("agg_approx_topk: sketch is exact at fixture scale, ranks dense") {
    val rows = q("agg_approx_topk").collect()
    assert(rows.map(_.getAs[Long]("rnk")).toSeq === (1L to rows.length))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("est_exact"),
        s"approx_top_k diverged on ${r.getString(1)}")
      assert(r.getAs[Long]("est_cnt") === r.getAs[Long]("exact_cnt"))
    }
    // Counts are non-increasing down the ranking.
    val cnts = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("exact_cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("map_hof_funcs: HOF results equal the direct arithmetic") {
    val rows = q("map_hof_funcs").collect()
    rows.foreach { r =>
      val (s10, c10) = (r.getAs[Long]("sum_x10"), r.getAs[Long]("cnt_x10"))
      assert(s10 % 10 === 0 && c10 % 10 === 0)
      assert(r.getAs[Long]("sum_renamed") === s10 / 10)
      assert(r.getAs[Long]("sum_3x") === 3 * (s10 / 10))
      assert(r.getAs[Long]("cnt_3x") === 3 * (c10 / 10))
      val expectEven = (if ((s10 / 10) % 2 == 0) 1 else 0) +
                       (if ((c10 / 10) % 2 == 0) 1 else 0)
      assert(r.getAs[Long]("n_even") === expectEven)
    }
  }

  test("dt_interval_arith: interval shifts are exact microsecond moves") {
    val rows = q("dt_interval_arith").collect()
    val base = Tables.events(spark, sf).groupBy("event_type")
      .agg(min("ts").as("f"), max("ts").as("l")).orderBy("event_type").collect()
    assert(rows.length === base.length)
    rows.zip(base).foreach { case (r, b) =>
      val f = b.getAs[java.sql.Timestamp]("f").getTime
      val l = b.getAs[java.sql.Timestamp]("l").getTime
      assert(r.getAs[java.sql.Timestamp]("plus_1d2h30m").getTime ===
        f + (26 * 3600L + 30 * 60L) * 1000L)
      assert(r.getAs[java.sql.Timestamp]("minus_90m").getTime ===
        l - 90 * 60L * 1000L)
      assert(r.getAs[Long]("span_s") ===
        Math.floorDiv(l, 1000L) - Math.floorDiv(f, 1000L))
    }
  }

  test("llm_bpe_encode: vocab cut plans as TakeOrderedAndProject, not a global sort") {
    val plan = q("llm_bpe_encode").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected the top-256 vocab cut as TakeOrderedAndProject:\n$plan")
  }

  test("graph_pagerank_knn: per-iteration lineage is cut") {
    // With ranks localCheckpoint'd each round, the final plan hangs off
    // checkpointed RDDs instead of 3 stacked join trees.
    val plan = q("graph_pagerank_knn").queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"expected checkpointed ranks lineage:\n$plan")
  }
}
