package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 fifth-batch invariants: partition pruning actually reaches
  * the scan (plan-level assertion), the MinHash estimate is exact for
  * identical sets and bounded everywhere, the z-score flags agree with
  * Spark's own stddev, and the histogram partitions the corpus.
  */
class Round5eSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("scan_partition_pruned: the day predicate lands in PartitionFilters") {
    val df = q("scan_partition_pruned")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "read must be partition-aware")
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("day_num"),
      s"day_num must appear in PartitionFilters, got: $pf")
    // And the result only contains the selected days.
    assert(df.filter(col("day_num") < 20240110L ||
      col("day_num") > 20240114L).count() === 0)
  }

  test("llm_minhash_jaccard_audit: estimate bounded, exact for identical sets") {
    val audit = q("llm_minhash_jaccard_audit")
    assert(audit.filter(col("est_jaccard") < 0 || col("est_jaccard") > 1 ||
      col("exact_jaccard") < 0 || col("exact_jaccard") > 1).count() === 0)
    // Identical token sets hash to identical signatures: exact=1 ⇒ est=1.
    assert(audit.filter(col("exact_jaccard") === 1.0 &&
      col("est_jaccard") =!= 1.0).count() === 0)
    // 16 slots give a std error of ~sqrt(J(1-J)/16) ≤ 0.125; the MEAN
    // absolute error across audited pairs must be well inside that.
    if (audit.count() > 0) {
      val meanErr = audit.agg(avg("abs_err")).head.getDouble(0)
      assert(meanErr < 0.15, s"mean |est-exact| = $meanErr")
    }
  }

  test("events_anomaly_hours agrees with stddev_samp within rounding") {
    val flagged = q("events_anomaly_hours")
    val hc = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hc.groupBy("event_type")
      .agg(avg("cnt").as("mu"), stddev_samp("cnt").as("sd"))
    val recomputed = hc.join(stats, Seq("event_type"))
      .withColumn("z2", (col("cnt") - col("mu")) / col("sd"))
      .filter(abs(col("z2")) >= 2 - 1e-9)
    // Same flag set up to the rounding boundary: every declared flag
    // has |z2| >= 1.99 in the reference computation.
    val joined = flagged.join(recomputed, Seq("event_type", "hr"))
    assert(joined.count() === flagged.count() ||
      flagged.join(recomputed.filter(abs(col("z2")) >= 1.99),
        Seq("event_type", "hr")).count() === flagged.count())
  }

  test("llm_length_histogram partitions the corpus into consistent buckets") {
    val hist = q("llm_length_histogram")
    val total = hist.agg(sum("n_docs")).head.getLong(0)
    assert(total === Tables.documents(spark, sf).count())
    val viol = hist.filter(
      col("min_tokens") < col("bucket10") * 10 ||
      col("max_tokens") >= (col("bucket10") + 1) * 10 ||
      col("min_tokens") > col("max_tokens")).count()
    assert(viol === 0)
  }
}
