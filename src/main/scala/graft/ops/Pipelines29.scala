package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 batch — SURVEY.md §2.15: the in-plan adaptive scale knob
  * extended to the kNN-graph build (VERDICT r11 next-round task 1 —
  * the last sign-LSH pipeline whose plane count was frozen at fixture
  * scale). SURVEY §2.0 determinism rules apply: integer arithmetic
  * until one final division, every key ends in an ORDER BY.
  */
object Pipelines29 {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // Approximate kNN GRAPH with the plane count derived in-plan:
    // np = max(5, bits((N−1) div 250)) from count(*) — the
    // llm_sim_topk_lsh_adaptive formula with the graph key's 5-plane
    // floor, so at the check fixtures (N ≤ 2000 → bits ≤ 3) the edge
    // set provably equals the pinned llm_knn_graph_lsh (asserted in
    // Round12Spec) while at 100× (200 k vecs) np = 10 → 1024 cells:
    // Σ|cell|² candidate volume AND the bucket join's shuffle-key
    // space both grow with the corpus instead of collapsing onto 32
    // keys (the round-11 probe killed the pinned form after 30+ min
    // at ~1 busy core; BASELINE.md embeddings probe section). Output
    // carries np so the knob itself is oracle-checked.
    "llm_knn_graph_lsh_adaptive" -> ((s, d) => {
      graft.functions.CosineSimilarity.register(s)
      val planes = Tables.embeddings(s, d)
        .agg(count(lit(1)).as("n_vecs"))
        .select(greatest(lit(5),
                  length(expr("bin((n_vecs - 1) div 250)")))
          .cast("int").as("np"))
      val bucketed = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(planes))
        .withColumn("bucket", graft.functions.SignLsh.bucketCol("np"))
      val pairs = bucketed
        .select(col("np"), col("bucket"), col("vec_id").as("src_id"),
                col("embedding").as("se"))
        .join(bucketed.select(col("bucket"), col("vec_id").as("dst_id"),
                col("embedding").as("de")), Seq("bucket"))
        .filter(col("src_id") =!= col("dst_id"))
        .select(col("src_id"), col("dst_id"),
                col("np").cast("long").as("np"),
                (round(expr("graft_cosine_sim(se, de)"), 4) + 0.0)
                  .as("cos_sim"))
      val w = Window.partitionBy("src_id")
        .orderBy(desc("cos_sim"), asc("dst_id"))
      pairs.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("src_id", "rnk")
    })
  )

  def oracles: Map[String, String] = Map(
    "llm_knn_graph_lsh_adaptive" ->
      s"""WITH nv AS (
           SELECT CAST(greatest(5, length(bin((count(*) - 1) // 250)))
                    AS INTEGER) AS np
           FROM embeddings
         ),
         bucketed AS (
           SELECT vec_id, embedding, np,
                  ${graft.functions.SignLsh.duckBucketSql("np")} AS bucket,
                  sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    AS nrm
           FROM embeddings CROSS JOIN nv
         ),
         pairs AS (
           SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
                  CAST(a.np AS BIGINT) AS np,
                  round(list_aggregate(
                          list_transform(list_zip(a.embedding, b.embedding),
                            z -> CAST(z[1] AS DOUBLE) *
                                 CAST(z[2] AS DOUBLE)), 'sum')
                        / (a.nrm * b.nrm), 4) + 0.0 AS cos_sim
           FROM bucketed a JOIN bucketed b
             ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         )
         SELECT src_id, dst_id, np, cos_sim,
                row_number() OVER (PARTITION BY src_id
                                   ORDER BY cos_sim DESC, dst_id)
                  AS rnk
         FROM pairs
         QUALIFY rnk <= 3
         ORDER BY src_id, rnk"""
  )
}
