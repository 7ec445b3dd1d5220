package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14: the two weak-key conversions (salted IVF-batch join,
  * composed OR × radius search) and the two composition keys (gated
  * PageRank, persisted IVF index).
  *
  * The load-bearing properties, each pinned where the sf0.01 oracle
  * gate cannot see it:
  *  - the ×8 salt pattern with the REPLICATION ON THE CORPUS SIDE and
  *    the kept salt on the probe side is join-equivalent to the
  *    unsalted join (the r13 keys salt the other way around; the
  *    direction choice is new in round 14);
  *  - the composed OR key's recall at the fixture (where the truth is
  *    computable exactly) is high — the point of composing tables ×
  *    radius is recall, so the spec pins it, not just the row shape;
  *  - the gate no-op point propagates through PageRank: at fixtures no
  *    subcell reaches CAP, so gated PageRank ≡ ungated PageRank;
  *  - the persisted-index roundtrip is lossless: the re-read query
  *    path answers bit-identically to the in-plan `llm_sim_topk_ivf`.
  */
class Round14Spec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("x8 salt with corpus-side replication is join-equivalent to the unsalted join") {
    // The ivf_batch pattern in miniature: corpus rows explode across
    // all 8 salts, probe rows keep pmod(xxhash64(id), 8) — every
    // (corpus, probe) pair must meet exactly once, on the probe row's
    // salt. A skewed cell distribution (most ids in cell 0) makes the
    // test exercise the hot-key case the salt exists for.
    val corpus = spark.range(0, 400)
      .select(col("id").as("vec_id"),
              when(col("id") % 10 === 0, col("id") % 3)
                .otherwise(lit(0L)).as("cell"))
    val probes = spark.range(0, 60)
      .select((col("id") * 7).as("probe_id"), (col("id") % 3).as("cell"))
    val unsalted = corpus.join(probes, Seq("cell"))
      .select("cell", "vec_id", "probe_id")
    val salted = corpus
      .withColumn("salt", explode(sequence(lit(0L), lit(7L))))
      .join(probes.withColumn("salt",
              pmod(xxhash64(col("probe_id")), lit(8L))),
            Seq("cell", "salt"))
      .select("cell", "vec_id", "probe_id")
    assert(salted.count() === unsalted.count())
    assert(rows(salted) === rows(unsalted))
  }

  test("cellArgmax packed-BIGINT form equals max(struct(cs, -cent_id)) incl. ties") {
    // The round-14 SortAggregate fix must be bit-equivalent to the
    // struct argmax it replaces: same winning cs, same min-cent_id
    // tiebreak. Synthetic scores with deliberate cs ties, negative
    // values, and the 4-decimal grid the keys produce.
    val scores = spark.range(0, 5000)
      .select((col("id") % 100).as("vec_id"), (col("id") % 37).as("cent_id"))
      .withColumn("cs",
        (round(sin(col("vec_id") * col("cent_id") + lit(1)), 4) + 0.0))
    val viaStruct = scores.groupBy("vec_id")
      .agg(max(struct(col("cs"), (-col("cent_id")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cell"))
    val viaPack = ops.Pipelines4.cellArgmax(scores)
    assert(rows(viaPack) === rows(viaStruct))
  }

  test("llm_sim_topk_ivf_batch (salted) keeps the ivf contract: 3 ranked rows per probe") {
    val out = SparkEntry.queries("llm_sim_topk_ivf_batch")(spark, sf)
      .collect()
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to rs.length).toSeq)
      assert(rs.length <= 3)
    }
    // Probe set = every 50th vector of the 500-vector fixture corpus.
    assert(byProbe.keySet.forall(_ % 50 == 0))
  }

  test("composed OR x radius-2 key: high fixture recall vs the exact scan") {
    // np = 3 at the fixture, so each table's Hamming<=2 ball covers
    // 7 of 8 buckets: the composed candidate set is near-total and
    // recall against the exact truth must be near-1 — the composition
    // property (independent tables x adjacent buckets) in the regime
    // where the truth is cheaply computable.
    val truth = SparkEntry.queries("llm_sim_topk")(spark, sf)
      .select("probe_id", "neighbor_id")
    val approx = SparkEntry.queries("llm_sim_topk_lsh_or")(spark, sf)
      .select("probe_id", "neighbor_id")
    val nTruth = truth.count()
    val hit = truth.join(approx, Seq("probe_id", "neighbor_id"),
      "left_semi").count()
    assert(nTruth === 30L)
    assert(hit >= 27L, s"fixture recall $hit/$nTruth below 0.9")
  }

  test("recall audit covers the three approximate search keys, 10 probes each") {
    val out = SparkEntry.queries("llm_sim_recall_audit")(spark, sf)
      .collect()
    assert(out.length === 30)
    val byMethod = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byMethod === Map("lsh_adaptive" -> 10, "lsh_or" -> 10,
                            "ivf_batch" -> 10))
    out.foreach { r =>
      val (nTrue, nHit, pct) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nTrue === 3L)
      assert(nHit >= 0L && nHit <= nTrue)
      assert(pct === (100 * nHit) / nTrue)
    }
    // The composed OR key's audited recall at the fixture is near-1
    // (same property as the direct test above, via the audit path).
    val orHits = out.filter(_.getString(0) == "lsh_or")
      .map(_.getLong(3)).sum
    assert(orHits >= 27L)
  }

  test("gate no-op point propagates: gated PageRank == ungated PageRank at fixture") {
    val gated = SparkEntry.queries("graph_pagerank_hub_gated")(spark, sf)
    val ungated = SparkEntry.queries("graph_pagerank_knn")(spark, sf)
    assert(rows(gated) === rows(ungated))
  }

  test("persisted IVF index answers bit-identically to the in-plan key") {
    val persisted =
      SparkEntry.queries("llm_sim_topk_ivf_persisted")(spark, sf)
    val inPlan = SparkEntry.queries("llm_sim_topk_ivf")(spark, sf)
    assert(rows(persisted) === rows(inPlan))
  }
}
