package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 fourth-batch invariants: the Bloom screen never drops a
  * true member (one-sided error), the conversion funnel respects its
  * time constraint, overlap Jaccard is bounded by the smaller set,
  * basket ranking is deterministic, and per-region shares sum to one.
  */
class Round5dSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("join_bloom_screen: candidates are a superset of exact (no false negatives)") {
    val row = q("join_bloom_screen").head
    val nCand = row.getAs[Long]("n_candidates")
    val nExact = row.getAs[Long]("n_exact")
    val nFp = row.getAs[Long]("n_false_pos")
    assert(nFp >= 0, "Bloom screens must never produce false negatives")
    assert(nCand === nExact + nFp)
    // Exact count cross-check against a direct semi join.
    val direct = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
              .filter(col("c_mktsegment") === "AUTOMOBILE")
              .select("c_custkey"),
            col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(nExact === direct)
  }

  test("events_conversion_lag: purchase within [signup, signup+7d]") {
    val lags = q("events_conversion_lag")
    assert(lags.filter(col("lag_s") < 0 ||
      col("lag_s") > 7L * 86400).count() === 0)
    assert(lags.filter(col("purchase_ts") < col("signup_ts")).count() === 0)
    // One row per converting user.
    assert(lags.groupBy("user_id").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("insta_audience_overlap: n_both <= min set size; jaccard in (0,1]") {
    val ov = q("insta_audience_overlap")
    val sizes = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val viol = ov
      .join(sizes.withColumnRenamed("event_type", "type_a")
                 .withColumnRenamed("n", "na"), Seq("type_a"))
      .join(sizes.withColumnRenamed("event_type", "type_b")
                 .withColumnRenamed("n", "nb"), Seq("type_b"))
      .filter(col("n_both") > least(col("na"), col("nb")) ||
              col("jaccard") <= 0 || col("jaccard") > 1)
      .count()
    assert(viol === 0)
    // 5 event types -> exactly C(5,2) = 10 pairs when all types share
    // at least one user (true for the fixture's dense small-sf users).
    assert(q("insta_audience_overlap").count() === 10)
  }

  test("orders_basket_pairs: ranked deterministically, counts positive and non-increasing") {
    val rows = q("orders_basket_pairs").collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("n_orders"))
    assert(counts.forall(_ >= 1))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
  }

  test("agg_share_of_total: shares within each region sum to ~1") {
    val shares = q("agg_share_of_total").collect()
      .groupBy(_.getAs[String]("r_name"))
    shares.foreach { case (region, rows) =>
      val s = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 5e-3, s"region $region shares sum to $s")
    }
  }
}
