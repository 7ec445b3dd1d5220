package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE kNN-edge build (round 13): one implementation of the
  * "top-3-cosine neighbors within adaptive sign-LSH cells" construction
  * that four sites previously each re-derived — `llm_knn_graph_lsh`,
  * `llm_knn_graph_lsh_adaptive`, `graph_pagerank_knn`'s edge input, and
  * the recursive-CTE key's input graph (Pipelines23). The VERDICT r12
  * finding this closes: the ×8 salt replication that the round-12d
  * 1000× planted-twin probe proved necessary on bucket self-joins (a
  * cluster-dense cell collapses the join to a 1–2-core straggler) had
  * been applied to only 2 of the repo's 6 such joins; the four kNN-edge
  * builds carried the measured straggler shape. Centralizing the build
  * salts all four at once and removes the duplicate plans.
  *
  * Plan shape:
  *  - np = max(floor, bits((N−1) div 250)) derived from count(*)
  *    IN-PLAN (the adaptive-plane formula, integer-exact in both
  *    engines): one more hyperplane per corpus doubling keeps expected
  *    cell size ~250 vectors, so Σ|cell|² candidate volume AND the
  *    bucket join's shuffle-key space grow with the corpus instead of
  *    collapsing onto 2^floor keys (the round-11 probe killed the
  *    pinned form after 30+ min at ~1 busy core).
  *  - SKEW GUARD (round 12d pattern, Pipelines29/LlmScale template):
  *    the src side keeps ONE salt (xxhash64(vec_id) mod 8), the dst
  *    side replicates across all 8 — every (src, dst) pair still meets
  *    exactly once, on the src row's salt, so the OUTPUT is provably
  *    identical to the unsalted join and the oracles are untouched;
  *    the hot cell's quadratic candidate work splits 8 ways at a
  *    linear (8·N payload rows) build-side replication cost.
  *  - Exact cosine scoring inside the cell, top-3 per src via a
  *    row_number window partitioned on src_id (uniform key).
  *
  * At the check fixtures (N ≤ 2000 → bits ≤ 3) floor = 5 makes the
  * edge set provably equal to the previously-pinned 5-plane build
  * (Round12Spec asserts the fixture equality), which is why the pinned
  * `llm_knn_graph_lsh` key can share this body with its adaptive twin:
  * identical output at fixture scale, adaptive cells beyond it.
  */
object KnnEdges {

  /** Salted adaptive-cell top-3 edges: `src_id, dst_id, np, cos_sim,
    * rnk` with rnk ≤ 3 (unordered — callers add their ORDER BY). */
  def topkEdges(s: SparkSession, d: String, floor: Int = 5): DataFrame = {
    graft.functions.CosineSimilarity.register(s)
    val planes = Tables.embeddings(s, d)
      .agg(count(lit(1)).as("n_vecs"))
      .select(greatest(lit(floor),
                length(expr("bin((n_vecs - 1) div 250)")))
        .cast("int").as("np"))
    val bucketed = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(planes))
      .withColumn("bucket", graft.functions.SignLsh.bucketCol(s, "np"))
    val srcs = bucketed
      .withColumn("salt", pmod(xxhash64(col("vec_id")), lit(8L)))
      .select(col("np"), col("bucket"), col("salt"),
              col("vec_id").as("src_id"), col("embedding").as("se"))
    val dsts = bucketed
      .withColumn("salt", explode(sequence(lit(0L), lit(7L))))
      .select(col("bucket"), col("salt"),
              col("vec_id").as("dst_id"), col("embedding").as("de"))
    val pairs = srcs.join(dsts, Seq("bucket", "salt"))
      .filter(col("src_id") =!= col("dst_id"))
      .select(col("src_id"), col("dst_id"),
              col("np").cast("long").as("np"),
              (round(expr("graft_cosine_sim(se, de)"), 4) + 0.0)
                .as("cos_sim"))
    val w = Window.partitionBy("src_id")
      .orderBy(desc("cos_sim"), asc("dst_id"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
  }

  /** The bare edge list (`src_id, dst_id`) for graph consumers
    * (PageRank, recursive reachability). */
  def edgeList(s: SparkSession, d: String): DataFrame =
    topkEdges(s, d).select("src_id", "dst_id")
}
