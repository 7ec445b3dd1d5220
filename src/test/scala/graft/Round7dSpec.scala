package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 fourth-batch invariants. The Q21 test is the load-bearing
  * one: the single-scan window re-plan must equal the textbook
  * EXISTS / NOT EXISTS triple-scan formulation row for row.
  */
class Round7dSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("tpch_q21_late_supplier equals the textbook EXISTS/NOT-EXISTS form") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("q21t_li")
    Tables.orders(spark, sf).createOrReplaceTempView("q21t_ord")
    Tables.supplier(spark, sf).createOrReplaceTempView("q21t_supp")
    val textbook = spark.sql(
      """WITH le AS (
           SELECT l_orderkey, l_suppkey,
                  datediff(to_date(l_shipdate), to_date(o_orderdate)) > 90
                    AS late
           FROM q21t_li JOIN q21t_ord ON o_orderkey = l_orderkey
         )
         SELECT s_name, count(DISTINCT l_orderkey) AS numwait
         FROM le l1 JOIN q21t_supp ON s_suppkey = l_suppkey
         WHERE l1.late
           AND EXISTS (SELECT 1 FROM le l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM le l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.late)
         GROUP BY s_name""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("tpch_q21_late_supplier").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === textbook)
    assert(got.nonEmpty)
  }

  test("tpch_q19_disjunct matches a brute-force evaluation and broadcasts part") {
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .collect()
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    var n = 0L
    li.foreach { r =>
      val (brand, size) = parts(r.getLong(0))
      val qty = r.getDouble(1)
      val hit =
        (brand == "Brand#12" && size >= 1 && size <= 15 &&
           qty >= 1 && qty <= 11) ||
        (brand == "Brand#23" && size >= 1 && size <= 25 &&
           qty >= 10 && qty <= 20) ||
        (brand == "Brand#34" && size >= 1 && size <= 35 &&
           qty >= 20 && qty <= 30)
      if (hit) n += 1
    }
    val row = q("tpch_q19_disjunct").collect().head
    assert(row.getLong(0) === n)
    val plan = q("tpch_q19_disjunct").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part side should broadcast")
  }

  test("agg_hll_mergeable: daily-sketch union stays inside the 5% envelope") {
    val rows = q("agg_hll_mergeable").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"), r.getString(0))
      assert(r.getAs[Long]("exact_users") > 0)
    }
  }

  test("events_value_histogram buckets partition the event count") {
    val rows = q("events_value_histogram").collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 19)
    }
  }

  test("scan_nested_prune reads only the money leaves back") {
    val df = q("scan_nested_prune")
    // The read-back scan (over the nested sink, not the orders source)
    // must prune to the money struct: cust.* and o_orderkey absent.
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("orders_nested"))
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.contains("money"), "money struct must be read")
      assert(!s.contains("cust"), "cust struct must be pruned")
    }
    // And the aggregate equals computing straight from the source.
    val direct = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
           sum(round(col("o_totalprice") * 100).cast("long"))
             .as("sum_cents"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    df.collect().foreach { r =>
      val (nOrd, cents) = direct(r.getString(0))
      assert(r.getLong(1) === nOrd)
      assert(r.getLong(2) === cents)
    }
  }

  test("events_path_2gram total equals sum of per-user max(0, n-2)") {
    val perUser = Tables.events(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => math.max(0L, r.getLong(1) - 2)).sum
    val got = q("events_path_2gram").collect().map(_.getAs[Long]("n")).sum
    assert(got === perUser)
  }
}
