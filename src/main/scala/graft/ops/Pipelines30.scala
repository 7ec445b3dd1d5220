package graft.ops

import graft.Tables
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
    }),

    // OR-AMPLIFIED sign-LSH top-k search (VERDICT r12 missing item 3:
    // the dedup family got the T-table union in round 12d —
    // `llm_dedup_embedding_lsh_or` — while the search keys' only
    // recall device was the probe radius). Same fused construction:
    // ONE codegen'd graft_sign_lsh(embedding, 4·np) call yields all
    // T = 4 tables' buckets by bit slicing (table t buckets on global
    // plane indices t·np .. t·np+np−1 — disjoint independent
    // hyperplane sets, Round12dSpec's slice-parity proof), so per-table
    // collision probability P composes to 1−(1−P)⁴ while the corpus
    // side pays exactly 4 table scans. This is the ORTHOGONAL recall
    // dial to `llm_sim_topk_lsh_adaptive`'s Hamming radius: radius
    // probes NEARBY cells of one partition (recall from bucket
    // adjacency), OR-tables re-partition the space T independent ways
    // (recall from independence) — at production scale the two
    // compose (T tables × radius-r probes each). Here each table keeps
    // the exact-bucket probe so the measured delta vs the adaptive key
    // isolates the OR effect. No salt: the probe side is a ~40-row
    // broadcast (no shuffle-key axis — the same argument as the pinned
    // key), and candidates stream through the broadcast hash join. A
    // neighbor can collide in several tables; cos_sim is deterministic
    // per pair, so the pre-window distinct on the full row is exact
    // and runs on the candidate grain (bounded: ≤ 4 rows per true
    // pair), not the corpus grain.
    "llm_sim_topk_lsh_or" -> ((s, d) => {
      graft.functions.CosineSimilarity.register(s)
      import org.apache.spark.sql.expressions.Window
      val nv = Tables.embeddings(s, d)
        .agg(count(lit(1)).as("n_vecs"))
        .select(least(lit(15), greatest(lit(3),
                  length(expr("bin((n_vecs - 1) div 250)"))))
          .cast("int").as("np"))
      val tb = Tables.embeddings(s, d).select("vec_id", "embedding")
        .crossJoin(broadcast(nv))
        .withColumn("allb", graft.functions.SignLsh.bucketCol(s, "4 * np"))
        .select(col("vec_id"), col("embedding"), col("np"),
                col("allb"), explode(expr("sequence(0, 3)")).as("t"))
        .select(col("vec_id"), col("embedding"), col("np"), col("t"),
                expr("""shiftright(allb, (3 - t) * np)
                        & (shiftleft(cast(1 as bigint), np) - 1)""")
                  .as("bucket"))
      val probes = tb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
                col("t"), col("bucket"))
      val pairs = tb.join(broadcast(probes), Seq("t", "bucket"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
                col("np").cast("long").as("np"),
                (round(expr("graft_cosine_sim(pe, embedding)"), 4) + 0.0)
                  .as("cos_sim"))
        .distinct()
      val w = Window.partitionBy("probe_id")
        .orderBy(desc("cos_sim"), asc("neighbor_id"))
      pairs.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("probe_id", "rnk")
    }),

    // Query-MANY IVF top-k — the amortized workload shape the
    // build-once structure is FOR (VERDICT r12 missing item 2: charging
    // the O(N·k) assignment build to a 10-query load let the exact scan
    // dominate IVF at every measured point; IvfProbe's split timing
    // shows the 400 k-corpus build amortizing in ~2.5 × 1000-probe
    // batches at np=256 / recall 0.768). Here the probe set SCALES
    // WITH THE CORPUS — every 50th vector queries the index, N/50
    // probes — so the per-probe build share is 50·k cosines and
    // shrinking, while the exact rival's cost for the same batch is
    // (N/50)·N cosines and quadratic. Same in-plan dials as
    // `llm_sim_topk_ivf` (stride = max(50, N div 4096) bounds k ≤ 4096
    // broadcastable centroids; nprobe = max(2, k div 16) holds the
    // probed cell fraction ~6%). The probe side is NOT broadcast —
    // (N/50)·np probe-cell rows join cells on the cell key, Σ_cell
    // |probes_in_cell|·|cell| work, both sides shuffled on a key whose
    // cardinality grows with the corpus. Per-probe ranking windows
    // partition on probe_id (N/50 uniform keys), never on a constant.
    "llm_sim_topk_ivf_batch" -> ((s, d) => {
      graft.functions.CosineSimilarity.register(s)
      import org.apache.spark.sql.expressions.Window
      def cosine(a: String, b: String) =
        expr(s"graft_cosine_sim($a, $b)")
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val sv = Tables.embeddings(s, d)
        .agg(count(lit(1)).as("n_vecs"))
        .select(greatest(lit(50L), expr("n_vecs div 4096")).as("stride"))
      val cents = e.crossJoin(broadcast(sv))
        .filter(col("vec_id") % col("stride") === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
      val scores = e.join(broadcast(cents))
        .select(col("vec_id"), col("cent_id"),
                (round(cosine("embedding", "ce"), 4) + 0.0).as("cs"))
      val cellsId = scores.groupBy("vec_id")
        .agg(max(struct(col("cs"), (-col("cent_id")).as("nc"))).as("m"))
        .select(col("vec_id"), (-col("m.nc")).as("cell"))
      val cells = e.join(cellsId, Seq("vec_id"))
        .select(col("vec_id"), col("embedding"), col("cell"))
      val npTab = cents.agg(
        greatest(lit(2L), expr("count(1) div 16")).as("np"))
      val wAsg = Window.partitionBy("vec_id")
        .orderBy(desc("cs"), asc("cent_id"))
      val probeCells = scores.filter(col("vec_id") % 50 === 0)
        .withColumn("rn", row_number().over(wAsg))
        .crossJoin(broadcast(npTab))
        .filter(col("rn") <= col("np"))
        .join(e.filter(col("vec_id") % 50 === 0)
                .select(col("vec_id"), col("embedding").as("pe")),
              Seq("vec_id"))
        .select(col("vec_id").as("probe_id"), col("pe"),
                col("cent_id").as("cell"))
      val w = Window.partitionBy("probe_id")
        .orderBy(desc("cos_sim"), asc("neighbor_id"))
      cells.join(probeCells, Seq("cell"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
                (round(cosine("pe", "embedding"), 4) + 0.0).as("cos_sim"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("probe_id", "rnk")
    }),

    // HUB-GATED kNN graph — the dedup family's quarantine answer
    // (llm_dedup_hub_quarantine) shipped for the GRAPH family. The
    // 1000× probe measured the exact build's residual cost
    // concentrated in irreducible near-parallel clusters (a
    // 54 513-vector refined subcell sharing all 25 sign bits —
    // unsplittable by ANY hyperplane, the LSH property itself); this
    // key quarantines refined subcells still above CAP = 2000 as
    // labeled kind='hub' rows and builds edges only over the kept
    // subcells, bounding total candidate volume at ≤ CAP·N by the
    // gate. Kept subcells' edges are IDENTICAL to the ungated key's
    // (the gate is per-subcell; candidates never cross cells). At the
    // fixtures no cell reaches CAP: output = the adaptive edge set,
    // zero hub rows — the gate's no-op point, same contract as the
    // refinement/np knobs, with the gate predicate itself mirrored in
    // the oracle.
    "llm_knn_graph_hub_gated" -> ((s, d) =>
      KnnEdges.gatedEdges(s, d)
        .orderBy("kind", "src_id", "rnk"))
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
         ORDER BY x.probe_id""",

    // Mirrors the fused bit-slice table construction of the dedup OR
    // oracle (Pipelines29) with the search key's top-3 window instead
    // of the threshold filter.
    "llm_sim_topk_lsh_or" ->
      s"""WITH nv AS (
           SELECT CAST(least(15, greatest(3,
                    length(bin((count(*) - 1) // 250)))) AS INTEGER) AS np
           FROM embeddings
         ),
         base AS (
           SELECT vec_id, embedding, np,
                  sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    AS nrm,
                  ${graft.functions.SignLsh.duckBucketSql("4 * np")} AS allb
           FROM embeddings CROSS JOIN nv
         ),
         tb AS (
           SELECT vec_id, embedding, nrm, np, t,
                  (allb >> CAST((3 - t) * np AS INTEGER))
                    & ((CAST(1 AS BIGINT) << np) - 1) AS bucket
           FROM base CROSS JOIN (SELECT unnest(range(0, 4)) AS t) tables
         ),
         cand AS (
           SELECT DISTINCT p.vec_id AS probe_id, n.vec_id AS neighbor_id,
                  CAST(p.np AS BIGINT) AS np,
                  round(list_aggregate(
                          list_transform(list_zip(p.embedding, n.embedding),
                            z -> CAST(z[1] AS DOUBLE) *
                                 CAST(z[2] AS DOUBLE)), 'sum')
                        / (p.nrm * n.nrm), 4) + 0.0 AS cos_sim
           FROM tb p JOIN tb n
             ON p.t = n.t AND p.bucket = n.bucket
                AND n.vec_id <> p.vec_id
           WHERE p.vec_id < 10
         )
         SELECT probe_id, neighbor_id, np, cos_sim,
                row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id)
                  AS rnk
         FROM cand
         QUALIFY rnk <= 3
         ORDER BY probe_id, rnk""",

    // The declared `llm_sim_topk_ivf` oracle with the query-many probe
    // predicate (vec_id % 50 = 0) in place of vec_id < 10.
    "llm_sim_topk_ivf_batch" ->
      """WITH sv AS (
           SELECT greatest(50, count(*) // 4096) AS stride FROM embeddings
         ),
         norms AS (
           SELECT vec_id, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    AS nrm
           FROM embeddings
         ),
         asg AS (
           SELECT e.vec_id, e.embedding, e.nrm, c.vec_id AS cent_id,
                  round(list_aggregate(
                          list_transform(list_zip(e.embedding, c.embedding),
                            z -> CAST(z[1] AS DOUBLE) *
                                 CAST(z[2] AS DOUBLE)), 'sum')
                        / (e.nrm * c.nrm), 4) + 0.0 AS cs
           FROM norms e CROSS JOIN norms c, sv
           WHERE c.vec_id % sv.stride = 0
         ),
         ranked_asg AS (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cs DESC, cent_id) AS rn
           FROM asg
         ),
         cells AS (
           SELECT vec_id, embedding, nrm, cent_id AS cell
           FROM ranked_asg WHERE rn = 1
         ),
         npv AS (
           SELECT greatest(2, count(*) // 16) AS np
           FROM embeddings, sv WHERE vec_id % sv.stride = 0
         ),
         probecells AS (
           SELECT vec_id AS probe_id, embedding AS pe, nrm AS pnrm,
                  cent_id AS cell
           FROM ranked_asg, npv WHERE vec_id % 50 = 0 AND rn <= npv.np
         ),
         cand AS (
           SELECT p.probe_id, n.vec_id AS neighbor_id,
                  round(list_aggregate(
                          list_transform(list_zip(p.pe, n.embedding),
                            z -> CAST(z[1] AS DOUBLE) *
                                 CAST(z[2] AS DOUBLE)), 'sum')
                        / (p.pnrm * n.nrm), 4) + 0.0 AS cos_sim
           FROM probecells p JOIN cells n USING (cell)
           WHERE n.vec_id <> p.probe_id
         )
         SELECT probe_id, neighbor_id, cos_sim,
                row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id)
                  AS rnk
         FROM cand
         QUALIFY rnk <= 3
         ORDER BY probe_id, rnk""",

    // Splices the shared edge-build fragment (knn_effs carries each
    // vector's refined-subcell size) and mirrors the gate: subcells
    // above CAP = 2000 emit labeled hub rows, edges are rebuilt among
    // kept subcells only. At the fixtures n_sub ≤ N ≤ 2000 everywhere,
    // so gpairs = knn_pairs and the hub branch is empty — the gate's
    // declared no-op point, with the predicate itself cross-checked.
    "llm_knn_graph_hub_gated" ->
      s"""WITH ${graft.ops.KnnEdges.duckEdgesCtes()},
         kept AS (
           SELECT * FROM knn_effs WHERE n_sub <= ${graft.ops.KnnEdges.Cap}
         ),
         gpairs AS (
           SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
                  round(list_aggregate(
                          list_transform(list_zip(a.embedding, b.embedding),
                            z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                          'sum') / (a.nrm * b.nrm), 4) + 0.0 AS cos_sim
           FROM kept a JOIN kept b
             ON a.d = b.d AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
         ),
         gedges AS (
           SELECT src_id, dst_id, cos_sim,
                  row_number() OVER (PARTITION BY src_id
                                     ORDER BY cos_sim DESC, dst_id) AS rnk
           FROM gpairs
           QUALIFY rnk <= 3
         )
         SELECT src_id, dst_id, cos_sim, rnk, 'edge' AS kind FROM gedges
         UNION ALL
         SELECT vec_id AS src_id, CAST(-1 AS BIGINT) AS dst_id,
                0.0 AS cos_sim, CAST(0 AS BIGINT) AS rnk, 'hub' AS kind
         FROM knn_effs WHERE n_sub > ${graft.ops.KnnEdges.Cap}
         ORDER BY kind, src_id, rnk"""
  )
}
