package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 first-batch invariants: the confusion matrix partitions
  * the corpus with per-lang shares summing to 1, KL divergences are
  * non-negative, the Zipf fit slopes downward, modal/quantile/funnel
  * keys reconcile against independently-computed facts.
  */
class Round6Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("llm_lang_confusion: cells partition the corpus; shares sum to 1 per lang") {
    val cm = q("llm_lang_confusion").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(cm.map(_.getAs[Long]("n_docs")).sum === nDocs)
    cm.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val share = rows.map(_.getAs[Double]("recall_share")).sum
      assert(math.abs(share - 1.0) < 0.01, s"$lang shares sum to $share")
    }
  }

  test("llm_source_kl: KL >= 0 (Gibbs) and token masses partition the corpus") {
    val kl = q("llm_source_kl").collect()
    // KL(p‖q) ≥ 0 always; allow rounding slack of 1e-4.
    assert(kl.forall(_.getAs[Double]("kl") >= -1e-4))
    val totalToks = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(kl.map(_.getAs[Long]("n_tokens")).sum === totalToks)
  }

  test("llm_zipf_fit: slope negative, intercept >= max ln(freq) fit anchor") {
    val row = q("llm_zipf_fit").head
    assert(row.getAs[Double]("slope") < 0.0)
    assert(row.getAs[Long]("n_vocab") > 0)
  }

  test("agg_mode_priority: one modal row per segment, count equals true max") {
    val m = q("agg_mode_priority").collect()
    val segs = Tables.customer(spark, sf)
      .select("c_mktsegment").distinct().count()
    assert(m.length === segs.toInt)
    val trueMax = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count()
      .groupBy("c_mktsegment").agg(max("count").as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    m.foreach { r =>
      assert(r.getAs[Long]("n_orders") ===
        trueMax(r.getAs[String]("c_mktsegment")))
    }
  }

  test("events_gap_quantiles: p50 <= p90, both are observed gap values") {
    val gq = q("events_gap_quantiles").collect()
    assert(gq.nonEmpty)
    gq.foreach { r =>
      val (p50, p90) = (r.getAs[Long]("p50_gap_us"), r.getAs[Long]("p90_gap_us"))
      assert(p50 > 0 && p50 <= p90)
    }
  }

  test("events_stickiness: ratio in (0,1], wau bounded by sum of dau") {
    val st = q("events_stickiness").collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      val s = r.getAs[Double]("stickiness")
      assert(s > 0 && s <= 1.0, s"stickiness $s out of range")
      assert(r.getAs[Long]("wau") <= r.getAs[Long]("dau_sum"))
    }
  }

  test("win_nth_value_frames: second_highest matches a direct rank-2 computation") {
    val w = q("win_nth_value_frames")
    val rank2 = Tables.supplier(spark, sf)
      .withColumn("cents",
        expr("cast(round(s_acctbal * 100) as bigint)"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("s_nationkey")
          .orderBy(col("cents").desc, col("s_suppkey"))))
      .filter(col("rk") === 2)
      .select(col("s_nationkey").as("nk"), col("cents").as("second"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    w.select("s_nationkey", "second_highest_cents").distinct().collect().foreach { r =>
      val nk = r.getInt(0)
      val sh = r.getLong(1)
      if (sh != -1L) assert(sh === rank2(nk))
      else assert(!rank2.contains(nk)) // single-supplier nation sentinel
    }
  }

  test("events_funnel_ordered: monotone stage counts, ordered <= unordered co-presence") {
    val f = q("events_funnel_ordered").head
    val (n1, n2, n3) = (f.getAs[Long]("n_signup"),
      f.getAs[Long]("n_click_after"), f.getAs[Long]("n_purchase_after"))
    assert(n1 >= n2 && n2 >= n3)
    // Unordered upper bound: users with both signup and click events.
    val ev = Tables.events(spark, sf)
    val both = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct()
      .join(ev.filter(col("event_type") === "click")
        .select("user_id").distinct(), Seq("user_id"), "left_semi")
      .count()
    assert(n2 <= both)
  }
}
