package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 third-batch invariants: winnowing selects a subset of the
  * gram hashes with guaranteed coverage, the count-min estimate never
  * undercounts, temperature mixing sums to ~1 and upweights small
  * sources, the text roundtrip is lossless, and the Q17/Q22
  * decorrelations keep their subquery semantics.
  */
class Round5cSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("llm_winnow_fingerprint: fps are gram hashes; every eligible doc is covered") {
    val fps = q("llm_winnow_fingerprint")
    val grams = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 7)
      .select(col("doc_id"),
              explode(expr("transform(sequence(1, size(toks) - 3), " +
                           "i -> concat_ws(' ', slice(toks, i, 4)))")).as("g"))
      .select(col("doc_id"),
              expr("cast(conv(substring(md5(cast(g as binary)),1,8),16,10) " +
                   "as bigint)").as("h"))
      .distinct()
    // Every selected fingerprint is one of the doc's gram hashes.
    assert(fps.join(grams,
      fps("doc_id") === grams("doc_id") && fps("fp") === grams("h"),
      "left_anti").count() === 0)
    // Every eligible doc selects at least one fingerprint, and the
    // winnowed set is a strict sample for long docs (density ~2/(w+1)).
    val docs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 7)
    assert(fps.select("doc_id").distinct().count() === docs.count())
  }

  test("agg_countmin_freq: estimate >= exact for every key; totals conserved") {
    val cms = q("agg_countmin_freq").collect()
    assert(cms.nonEmpty)
    cms.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"),
        s"CMS undercounted k=${r.getAs[Long]("k")}")
    }
    val totalExact = cms.map(_.getAs[Long]("exact_cnt")).sum
    val nWithK = Tables.events(spark, sf)
      .filter(get_json_object(col("props"), "$.k").isNotNull).count()
    assert(totalExact === nWithK)
  }

  test("llm_mix_temperature: probabilities sum to ~1 and flatten the distribution") {
    val mix = q("llm_mix_temperature").collect()
    val pSum = mix.map(_.getAs[Double]("p_sample")).sum
    assert(math.abs(pSum - 1.0) < 1e-2, s"sum(p)=$pSum")
    // Temperature 0.5 upweights small sources: p_sample/share ratio
    // must be (weakly) larger for the smallest source than the largest.
    val tot = mix.map(_.getAs[Long]("tok_count")).sum.toDouble
    val ratios = mix.map(r =>
      (r.getAs[Long]("tok_count"),
       r.getAs[Double]("p_sample") / (r.getAs[Long]("tok_count") / tot)))
    val smallest = ratios.minBy(_._1)
    val largest = ratios.maxBy(_._1)
    assert(smallest._2 >= largest._2,
      "alpha=0.5 must upweight the smallest source relative to the largest")
  }

  test("source_text_roundtrip equals direct per-lang totals") {
    val rt = q("source_text_roundtrip")
    val direct = Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(length(col("text"))).as("total_chars"))
      .orderBy("lang")
    assert(rt.collect().toSeq === direct.collect().toSeq)
  }

  test("tpch_q17_smallqty keeps only below-threshold rows (correlated-subquery semantics)") {
    // Recompute via Spark SQL's own correlated scalar subquery and
    // compare totals — the decorrelated plan must agree with the
    // correlated formulation it replaces.
    Tables.lineitem(spark, sf).createOrReplaceTempView("li_q17")
    Tables.part(spark, sf).createOrReplaceTempView("part_q17")
    val corr = spark.sql(
      """SELECT p_brand,
                cast(round(sum(cast(l_extendedprice as decimal(30,10)))
                           / 7.0, 2) + 0.0 as double) AS avg_yearly
         FROM li_q17 JOIN part_q17 ON l_partkey = p_partkey
         WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                             FROM li_q17 l2
                             WHERE l2.l_partkey = li_q17.l_partkey)
         GROUP BY p_brand ORDER BY p_brand""")
    assert(q("tpch_q17_smallqty").collect().toSeq === corr.collect().toSeq)
  }

  test("tpch_q22_dormant: survivors have no post-cutoff orders") {
    val dormant = q("tpch_q22_dormant")
    val survivors = Tables.customer(spark, sf)
      .crossJoin(broadcast(
        Tables.customer(spark, sf).filter(col("c_acctbal") > 0)
          .agg(avg("c_acctbal").as("thr"))))
      .filter(col("c_acctbal") > col("thr"))
      .join(Tables.orders(spark, sf)
              .filter(col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_semi")
    assert(survivors.count() === 0 ||
      dormant.agg(sum("numcust")).head.getLong(0) > 0)
    // numcust total equals the direct dormant count.
    val directCount = Tables.customer(spark, sf)
      .crossJoin(broadcast(
        Tables.customer(spark, sf).filter(col("c_acctbal") > 0)
          .agg(avg("c_acctbal").as("thr"))))
      .filter(col("c_acctbal") > col("thr"))
      .join(Tables.orders(spark, sf)
              .filter(col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val total =
      if (dormant.isEmpty) 0L
      else dormant.agg(sum("numcust")).head.getLong(0)
    assert(total === directCount)
  }
}
