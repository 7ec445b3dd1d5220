package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.6). Rank-style integer outputs are
  * cast to LongType to match DuckDB's BIGINT window results.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "win_rank_topk" -> ((s, d) => {
      // Unique tiebreak (orderkey, linenumber) makes rank deterministic.
      val w = Window.partitionBy("l_returnflag")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                col("l_extendedprice"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .orderBy("l_returnflag", "rnk")
    })
  )

  def oracles: Map[String, String] = Map(
    "win_rank_topk" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                rank() OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice DESC, l_orderkey,
                                      l_linenumber) AS rnk
         FROM lineitem
         QUALIFY rnk <= 5
         ORDER BY l_returnflag, rnk"""
  )
}
