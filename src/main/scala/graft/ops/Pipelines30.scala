package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 batch — SURVEY.md §2.16: the embedding-ANN recall audit
  * (VERDICT r12 missing item 4). The measured-error family already
  * covers every TOKEN sketch — count-min (`agg_countmin_freq` carries
  * its exact twin), Bloom, MinHash blocking (`llm_dedup_lsh_recall`),
  * SimHash — but the EMBEDDING family's recall lived only in probe
  * tooling (tools/RecallProbe, tools/TopkProbe), outside the
  * oracle-checked surface. This key closes the pattern: the exact
  * top-3 truth and the production LSH top-3 run side by side at
  * fixture scale, and the per-probe hit count is itself the
  * oracle-checked output, so "the sketch's measured error" is a
  * first-class, cross-engine-verified number for every sketch type
  * the engine ships. SURVEY §2.0 determinism rules apply: both top-3
  * sets are total-ordered (rounded cosine desc, id asc), recall is an
  * integer percentage via `div`, and the output ends in an ORDER BY.
  */
object Pipelines30 {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // Per-probe id recall of llm_sim_topk_lsh_adaptive against the
    // exact llm_sim_topk truth — the same strict metric TopkProbe
    // reports at 10×/100×/1000× (a tie on the rounded cosine counts
    // as a miss; both rankings are deterministic, so the number is
    // too). The exact side broadcasts its 10-probe set and scans the
    // corpus linearly (O(probes·N), never O(N²)) — affordable at any
    // corpus size, which is what makes the audit a key rather than a
    // fixture-only test: run it on a sample of a production corpus
    // and the np/radius dials' measured recall comes out as a table.
    // np rides along so the knob under audit is itself oracle-checked.
    "llm_sim_recall_audit" -> ((s, d) => {
      val exact = LlmPipeline.queries("llm_sim_topk")(s, d)
        .select(col("probe_id"), col("neighbor_id"))
      val approx = Pipelines28.queries("llm_sim_topk_lsh_adaptive")(s, d)
        .select(col("probe_id"), col("neighbor_id"), col("np"))
      val np = approx.agg(max("np").as("np"))
      exact
        .join(approx.select(col("probe_id"), col("neighbor_id"),
                            lit(1L).as("hit")),
              Seq("probe_id", "neighbor_id"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("n_true"),
             coalesce(sum("hit"), lit(0L)).as("n_hit"))
        .crossJoin(broadcast(np))
        .select(col("probe_id"), col("np"), col("n_true"), col("n_hit"),
                expr("(100 * n_hit) div n_true").as("recall_pct"))
        .orderBy("probe_id")
    })
  )

  def oracles: Map[String, String] = Map(
    // Splices the adaptive key's own candidate CTEs (shared fragment —
    // the audit and the audited key cannot drift apart), adds the
    // exact-truth CTE, and mirrors the strict id-recall join.
    "llm_sim_recall_audit" ->
      s"""WITH ${Pipelines28.duckAdaptiveTopkCtes},
         approx AS (
           SELECT probe_id, neighbor_id, np
           FROM pairs
           QUALIFY row_number() OVER (PARTITION BY probe_id
                                      ORDER BY cos_sim DESC, neighbor_id)
                     <= 3
         ),
         norms AS (
           SELECT vec_id, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    AS nrm
           FROM embeddings
         ),
         exactp AS (
           SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id
           FROM norms p JOIN norms e ON e.vec_id <> p.vec_id
           WHERE p.vec_id < 10
           QUALIFY row_number() OVER (
                     PARTITION BY p.vec_id
                     ORDER BY round(list_aggregate(
                         list_transform(list_zip(p.embedding, e.embedding),
                           z -> CAST(z[1] AS DOUBLE) *
                                CAST(z[2] AS DOUBLE)), 'sum')
                       / (p.nrm * e.nrm), 4) DESC, e.vec_id) <= 3
         )
         SELECT x.probe_id,
                (SELECT CAST(np AS BIGINT) FROM nv) AS np,
                count(*) AS n_true,
                CAST(coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL
                                       THEN 1 END), 0) AS BIGINT) AS n_hit,
                CAST((100 * coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL
                                              THEN 1 END), 0))
                     // count(*) AS BIGINT) AS recall_pct
         FROM exactp x LEFT JOIN approx a
           ON x.probe_id = a.probe_id AND x.neighbor_id = a.neighbor_id
         GROUP BY x.probe_id
         ORDER BY x.probe_id"""
  )
}
