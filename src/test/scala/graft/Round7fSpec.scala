package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 sixth-batch invariants (Spark-4 API surface). */
class Round7fSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("str_collation_group merges case variants exactly") {
    val rows = q("str_collation_group").collect()
    val base = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Collation-insensitive grouping must reproduce the ORIGINAL type
    // counts (the mixed-case synthesis only changes case, never type).
    assert(rows.map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
             === base)
  }

  test("agg_listagg rosters are ordered by rank and bounded at 5") {
    val rows = q("agg_listagg").collect()
    rows.foreach { r =>
      val names = r.getAs[String]("top_names").split(",")
      assert(names.length === r.getAs[Long]("n_top"))
      assert(names.length <= 5)
      assert(names.distinct.length === names.length)
    }
    // Spot-check one nation: roster equals the top-5 by (acctbal desc,
    // suppkey) recomputed directly.
    val nk = rows.head.getAs[Long]("s_nationkey")
    val expected = Tables.supplier(spark, sf)
      .filter(col("s_nationkey") === nk)
      .orderBy(desc("s_acctbal"), asc("s_suppkey"))
      .limit(5).collect().map(_.getAs[String]("s_name"))
    assert(rows.head.getAs[String]("top_names").split(",").toSeq
             === expected.toSeq)
  }

  test("set_union_byname conserves the order count across generations") {
    val rows = q("set_union_byname").collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === total)
    val tiers = rows.map(_.getString(0)).toSet
    assert(tiers.contains("pre_tier"))
  }

  test("filter_param_sql equals the spliced-literal formulation") {
    val got = q("filter_param_sql").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 5 && col("l_quantity") <= 15)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast("long")).as("sq"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === direct)
  }

  test("win_neighbor_excl_sum: leave-one-out identity per frame") {
    // For single-order customers the excluded frame is empty: 0/0.
    val rows = q("win_neighbor_excl_sum").collect()
    assert(rows.forall(_.getAs[Long]("nb_n") <= 4))
    val singles = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"), min("o_orderkey"))
      .filter(col("n") === 1).collect().map(_.getLong(2)).toSet
    if (singles.nonEmpty) {
      val byKey = rows.map(r =>
        r.getAs[Long]("o_orderkey") ->
          ((r.getAs[Long]("nb_sum"), r.getAs[Long]("nb_n")))).toMap
      singles.foreach { k => assert(byKey(k) === ((0L, 0L))) }
    }
  }
}
