package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 batch (SURVEY §2.14): MERGE upsert emulation, corpus
  * novelty, backlog sweep-line, LATERAL VIEW, multimodal resize,
  * forward as-of, ungated minhash pairs + the hub gate's algebra.
  */
class Round11Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sink_merge_upsert: action counts partition the key space") {
    val rows = q("sink_merge_upsert").collect()
      .map(r => r.getAs[String]("action") -> r.getAs[Long]("n_rows")).toMap
    val orders = Tables.orders(spark, sf)
    val nUpdate = orders.filter(col("o_orderkey") % 2 === 0 &&
                                col("o_orderkey") % 3 =!= 0).count()
    val nInsert = orders.filter(col("o_orderkey") % 6 === 0).count()
    val nKeep = orders.filter(col("o_orderkey") % 2 =!= 0 &&
                              col("o_orderkey") % 3 =!= 0).count()
    assert(rows("update") === nUpdate)
    assert(rows("insert") === nInsert)
    assert(rows("keep") === nKeep)
    // MERGE result cardinality: |target| + inserts.
    val nTarget = orders.filter(col("o_orderkey") % 3 =!= 0).count()
    assert(rows.values.sum === nTarget + nInsert)
  }

  test("llm_ngram_novelty: novel shingles across docs = distinct corpus shingles") {
    val rows = q("llm_ngram_novelty").collect()
    // Every distinct shingle is first-seen exactly once, at exactly
    // one doc — so sum(n_novel) must equal the corpus' distinct
    // shingle count, independently recomputed.
    val distinctShingles = Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(t) - 2),
             i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
                            element_at(t, i + 2)))""")).as("g"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("sum_novel")).sum === distinctShingles)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("novelty_x10"); b >= 0L && b <= 10L
    })
  }

  test("orders_backlog_sweep: opens and closes balance to zero") {
    val rows = q("orders_backlog_sweep").collect()
    // The final month's end-of-month backlog is the running sum of
    // ALL deltas = inserts - deletes = 0 (every joined order both
    // opens and closes inside the fixture range).
    val last = rows.maxBy(_.getAs[Long]("month_key"))
    assert(last.getAs[Long]("eom_open") === 0L)
    // Peak within a month bounds its end-of-month value.
    assert(rows.forall(r =>
      r.getAs[Long]("peak_open") >= r.getAs[Long]("eom_open")))
    assert(rows.forall(r => r.getAs[Long]("peak_open") >= 0L))
  }

  test("sql_lateral_view_explode: token mass equals the API-form count") {
    val total = q("sql_lateral_view_explode").collect()
      .map(_.getAs[Long]("n_tokens")).sum
    val apiTotal = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok")).count()
    assert(total === apiTotal)
  }

  test("llm_multimodal_resize: audio passthrough, others clipped to box budget") {
    val rows = q("llm_multimodal_resize").collect()
      .map(r => r.getAs[String]("media_type") ->
        (r.getAs[Long]("bytes_before"), r.getAs[Long]("bytes_after"))).toMap
    val (ab, aa) = rows("audio")
    assert(ab === aa, "audio must pass through resize untouched")
    for (t <- Seq("image", "video")) {
      val (b, a) = rows(t)
      assert(a <= b, s"$t resize must not grow payloads")
    }
  }

  test("join_asof_forward: every match is at-or-after, one row per view") {
    val df = q("join_asof_forward")
    val nViews = Tables.events(spark, sf)
      .filter(col("event_type") === "view").count()
    assert(df.count() === nViews)
    assert(df.filter(col("next_purchase_ts") < col("view_ts")).count() === 0L)
  }

  test("llm_multimodal_features: byte mass equals the SQL character sum") {
    val rows = q("llm_multimodal_features").collect()
    val mass = rows.map(_.getAs[Long]("byte_mass")).sum
    // Independent recomputation through Spark SQL string functions
    // (the typed mapPartitions path must agree with the declarative
    // form byte-for-byte on ASCII text).
    val sqlMass = Tables.documents(spark, sf)
      .select(expr(
        """aggregate(transform(split(text, ''),
             c -> ascii(c)), 0L, (a, x) -> a + x)""").as("m"))
      .agg(sum("m")).collect()(0).getLong(0)
    assert(mass === sqlMass)
    assert(rows.map(_.getAs[String]("media_type")).sorted.toSeq ===
      Seq("audio", "image", "video"))
    assert(rows.map(_.getAs[Long]("n_items")).sum ===
      Tables.documents(spark, sf).count())
  }

  test("adaptive-plane LSH dominates the pinned key per rank (np=3)") {
    // Round 12d added Hamming<=1 multi-probe to the adaptive key, so
    // at fixture scale its candidate set strictly CONTAINS the pinned
    // key's (same np=3 bucketing, probe set = own bucket + 3 flips) —
    // the old exact-equality assertion is replaced by the order-
    // statistics consequence: at every (probe, rank) the adaptive
    // cos_sim is >= the pinned cos_sim, and any pinned neighbor the
    // adaptive top-3 drops was displaced by a strictly better one.
    val adaptive = q("llm_sim_topk_lsh_adaptive").collect()
    assert(adaptive.forall(_.getAs[Long]("np") == 3L),
      "fixture N <= 2000 must derive np = 3")
    val pinnedSim = q("llm_sim_topk_lsh").collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rnk")) ->
                r.getAs[Double]("cos_sim")).toMap
    val gotSim = adaptive
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rnk")) ->
                r.getAs[Double]("cos_sim")).toMap
    pinnedSim.foreach { case (pr, sim) =>
      assert(gotSim.contains(pr), s"adaptive missing rank slot $pr")
      assert(gotSim(pr) >= sim,
        s"adaptive cos_sim at $pr regressed: ${gotSim(pr)} < $sim")
    }
  }

  test("adaptive plane formula: one more plane per corpus doubling, integer-exact") {
    // np = max(3, bits((N-1) div 250)): spot-check the growth curve
    // through the same SQL the operator uses.
    val cases = Seq(250L -> 3, 500L -> 3, 2000L -> 3, 2001L -> 4,
                    20000L -> 7, 64001L -> 9, 200000L -> 10)
    for ((n, want) <- cases) {
      val np = spark.sql(
        s"SELECT greatest(3, length(bin(($n - 1) div 250))) AS np")
        .collect()(0).getAs[Any]("np").toString.toInt
      assert(np === want, s"N=$n")
    }
  }

  test("minhash gate algebra: gated pairs + hub-incident pairs = ungated pairs") {
    val gated = q("llm_dedup_minhash_lsh").collect()
    val hubs = gated.filter(_.getAs[String]("kind") == "hub")
      .map(_.getAs[Long]("a_id")).toSet
    val gatedPairs = gated.filter(_.getAs[String]("kind") == "pair")
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val ungated = q("llm_dedup_minhash_pairs").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // Gated pairs are exactly the ungated pairs with no hub endpoint.
    assert(gatedPairs ===
      ungated.filter(p => !hubs(p._1) && !hubs(p._2)))
    // No declared pair touches a quarantined hub.
    assert(gatedPairs.forall(p => !hubs(p._1) && !hubs(p._2)))
  }
}
