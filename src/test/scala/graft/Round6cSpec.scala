package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 third-batch invariants: exact-moment skew/kurtosis agrees
  * with Spark's builtin accumulators, the duplication profile and
  * pivot reconcile with direct counts, diversity ratios are bounded,
  * LTV curves are monotone, and the tolerance as-of is a restriction
  * of the unbounded as-of join.
  */
class Round6cSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_skew_kurt_exact: matches builtin skewness/kurtosis to 1e-3") {
    val exact = q("agg_skew_kurt_exact").collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("skew"),
        r.getAs[Double]("excess_kurtosis"))).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(skewness("l_quantity").as("sk"), kurtosis("l_quantity").as("ku"))
      .collect()
    builtin.foreach { r =>
      val (sk, ku) = exact(r.getString(0))
      assert(math.abs(sk - r.getAs[Double]("sk")) < 1e-3)
      assert(math.abs(ku - r.getAs[Double]("ku")) < 1e-3)
    }
  }

  test("llm_doc_dup_ratio: doc masses partition the corpus, ratios bounded") {
    val dp = q("llm_doc_dup_ratio").collect()
    val n = Tables.documents(spark, sf).count()
    assert(dp.map(_.getAs[Long]("n_docs")).sum === n)
    dp.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
      val ratio = r.getAs[Double]("dup_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("llm_gram_diversity: one row per >=4-token doc, ratio in (0,1]") {
    val gd = q("llm_gram_diversity")
    val expected = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 4).count()
    assert(gd.count() === expected)
    gd.collect().foreach { r =>
      val div = r.getAs[Double]("diversity")
      assert(div > 0.0 && div <= 1.0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_grams"))
    }
  }

  test("pivot_multi_agg: per-type counts reconcile with direct totals") {
    val pv = q("pivot_multi_agg").collect()
    val direct = Tables.events(spark, sf)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pv.map(_.getAs[Long]("click_n")).sum === direct("click"))
    assert(pv.map(_.getAs[Long]("purchase_n")).sum === direct("purchase"))
    assert(pv.map(_.getAs[Long]("view_n")).sum === direct("view"))
  }

  test("events_cohort_ltv: cumulative revenue is monotone per cohort") {
    val ltv = q("events_cohort_ltv").collect()
    ltv.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rows) =>
      val cums = rows.sortBy(_.getAs[Long]("week_offset"))
        .map(_.getAs[Double]("cum_revenue"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-9 })
    }
  }

  test("join_asof_tolerance: a restriction of join_asof, bounded staleness") {
    val tol = q("join_asof_tolerance")
    val base = q("join_asof")
    assert(tol.count() === base.count()) // same purchase rows
    tol.filter(col("asof_signup_ts").isNotNull).collect().foreach { r =>
      val lag = r.getAs[java.sql.Timestamp]("purchase_ts").getTime -
        r.getAs[java.sql.Timestamp]("asof_signup_ts").getTime
      assert(lag >= 0 && lag <= 86400L * 1000)
    }
    // Every non-null tolerance match must equal the unbounded match.
    val joined = tol.alias("t").join(base.alias("b"), Seq("purchase_id"))
      .filter(col("t.asof_signup_ts").isNotNull)
      .filter(col("t.asof_signup_ts") =!= col("b.last_signup_ts"))
    assert(joined.count() === 0)
  }
}
