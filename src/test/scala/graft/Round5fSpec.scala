package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 sixth-batch invariants: Q8 shares bounded, Q15 maximality,
  * transition-matrix conservation, and the LSH recall audit's
  * guarantee that identical documents are never missed.
  */
class Round5fSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("tpch_q8_marketshare: share in [0,1], nation <= total") {
    val rows = q("tpch_q8_marketshare").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("nation_rev") <= r.getAs[Double]("total_rev"))
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0 && s <= 1)
    }
  }

  test("tpch_q15_topsupplier: winners carry the maximum revenue") {
    val top = q("tpch_q15_topsupplier").collect()
    assert(top.nonEmpty)
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= "1996-01-01" &&
              col("l_shipdate") < "1996-04-01")
      .groupBy("l_suppkey")
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
                       .cast("decimal(30,10)")), 2).cast("double")
             .as("total_rev"))
    val mx = rev.agg(max("total_rev")).head.getDouble(0)
    top.foreach(r => assert(r.getAs[Double]("total_rev") === mx))
    assert(top.length ===
      rev.filter(col("total_rev") === mx).count())
  }

  test("events_path_transitions conserves transitions and normalizes rows") {
    val m = q("events_path_transitions")
    val totalTrans = m.agg(sum("n_trans")).head.getLong(0)
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(totalTrans === nEvents - nUsers,
      "each user contributes exactly (events-1) transitions")
    m.collect().groupBy(_.getAs[String]("prev_type")).foreach {
      case (prev, rows) =>
        val p = rows.map(_.getAs[Double]("p_trans")).sum
        assert(math.abs(p - 1.0) < 5e-3, s"row $prev sums to $p")
    }
  }

  test("llm_dedup_lsh_recall: bounded, and identical docs are always found") {
    val rec = q("llm_dedup_lsh_recall")
    assert(rec.filter(col("n_found") > col("n_exact") ||
      col("recall") < 0 || col("recall") > 1).count() === 0)
    // Identical token sets have identical signatures, so every
    // probe-side exact-duplicate pair must be in the candidate set:
    // if any lang has all-duplicate truth pairs, recall there is 1.
    // Weaker universal check: for every lang, n_found >= number of
    // probe pairs with IDENTICAL text (which always collide).
    val dupPairs = Tables.documents(spark, sf).as("a")
      .join(Tables.documents(spark, sf).as("b"),
        col("a.doc_id") < col("b.doc_id") &&
        pmod(col("a.doc_id"), lit(20)) === 0 &&
        col("a.text") === col("b.text"))
      .groupBy(col("a.lang").as("lang"))
      .agg(count(lit(1)).as("n_dup"))
    val viol = rec.join(dupPairs, Seq("lang"))
      .filter(col("n_found") < col("n_dup")).count()
    assert(viol === 0)
  }
}
