package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scans, filters, joins, aggregations, sorts and set
  * ops (SURVEY.md §2.2–§2.5, §2.7).
  *
  * Determinism contract (§2.0): every query ends in a total ORDER BY,
  * every float aggregate is ROUNDed identically on both sides, every
  * output column is aliased, and integer-valued derived columns are
  * LongType to match DuckDB's BIGINT defaults.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ---- §2.2 scans ------------------------------------------------
    "scan_count" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("n"))),

    "scan_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- §2.3 filters ----------------------------------------------
    "filter_range" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
                col("l_shipdate") <  lit("1998-01-01") &&
                col("l_discount").between(0.05, 0.07))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_discount",
                "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- §2.4 joins ------------------------------------------------
    "join_inner" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("total_price"))
        .orderBy("c_custkey")
    }),

    // ---- §2.5 aggregations ----------------------------------------
    "agg_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ---- §2.7 sorts ------------------------------------------------
    "sort_global_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10))
  )

  def oracles: Map[String, String] = Map(
    "scan_count" ->
      "SELECT count(*) AS n FROM lineitem",

    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_orderkey, l_linenumber""",

    "filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_discount,
                l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate <  TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
         ORDER BY l_orderkey, l_linenumber""",

    "join_inner" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
                round(sum(o_totalprice), 2) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY c_custkey""",

    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
                round(avg(l_quantity), 2) AS avg_qty,
                round(avg(l_extendedprice), 2) AS avg_price,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS cnt
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "sort_global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""
  )
}
