package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 seventh-batch invariants: association metrics are
  * consistent with their defining counts, and the incremental screen
  * partitions every new document into exactly one class.
  */
class Round5gSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("orders_basket_lift: confidence <= 1, support floor holds, lift consistent") {
    val rules = q("orders_basket_lift").collect()
    rules.foreach { r =>
      assert(r.getAs[Long]("n_pair") >= 2)
      val conf = r.getAs[Double]("confidence_ab")
      assert(conf > 0 && conf <= 1)
      assert(r.getAs[Double]("lift") > 0)
    }
    // Lift recomputation for one rule from raw counts.
    if (rules.nonEmpty) {
      val r = rules.head
      val lp = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_partkey").distinct()
      val nOrders = lp.select("l_orderkey").distinct().count()
      val na = lp.filter(col("l_partkey") === r.getAs[Long]("part_a")).count()
      val nb = lp.filter(col("l_partkey") === r.getAs[Long]("part_b")).count()
      val expected = math.floor(
        (r.getAs[Long]("n_pair").toDouble * nOrders) / (na * nb)
          * 10000 + 0.5) / 10000
      assert(math.abs(r.getAs[Double]("lift") - expected) < 1e-9)
    }
  }

  test("llm_incremental_dedup: classes partition each source batch; old sources absent") {
    val inc = q("llm_incremental_dedup")
    val bad = inc.filter(
      col("n_exact_dup") + col("n_near_dup") + col("n_kept") =!=
        col("n_docs") ||
      col("n_exact_dup") < 0 || col("n_near_dup") < 0 ||
      col("n_kept") < 0).count()
    assert(bad === 0)
    // Only new sources (src10..src19) appear.
    assert(inc.filter(
      expr("cast(substring(source, 4, 8) as int)") < 10).count() === 0)
    // Totals cover the whole new batch.
    val total = inc.agg(sum("n_docs")).head.getLong(0)
    val direct = Tables.documents(spark, sf)
      .filter(expr("cast(substring(source, 4, 8) as int)") >= 10).count()
    assert(total === direct)
    // Every exact dup really has an identical old-side text.
    val docs = Tables.documents(spark, sf)
      .withColumn("src_num", expr("cast(substring(source, 4, 8) as int)"))
    val exactPairs = docs.filter(col("src_num") >= 10).as("n")
      .join(docs.filter(col("src_num") < 10).as("o"),
            col("n.text") === col("o.text"), "left_semi")
    val declaredExact = inc.agg(sum("n_exact_dup")).head.getLong(0)
    assert(declaredExact === exactPairs.count())
  }
}
