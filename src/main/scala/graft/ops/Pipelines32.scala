package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 batch — SURVEY.md §2.19: the two maintenance jobs that
  * complete the persisted-IVF index lifecycle (VERDICT r15 tasks 5–6).
  * Round 15 gave the index build-once persistence and append-per-batch
  * growth; a production corpus ALSO shrinks (takedowns, license
  * revocations, dedup verdicts) and drifts (appended batches pull away
  * from the centroids they are served by). (1) DELETE: a tombstone
  * table anti-joined at query time — deletes are metadata until a
  * compaction job rewrites ONLY the affected cell-group partitions
  * (dynamic partition overwrite, the copy-on-write economics every
  * table format uses) — checked against a full REBUILD on the
  * survivors. (2) DRIFT AUDIT: mean/decile distribution of
  * assigned-cosine for the appended batch vs a deterministic base
  * sample — the metric whose degradation triggers the rebuild the
  * append key's contract defers. SURVEY §2.0 determinism rules apply:
  * rounded cosines with id tiebreaks, integer micro-units with
  * non-negative `div` numerators, every key ends in an ORDER BY.
  */
object Pipelines32 {
  type Q = (SparkSession, String) => DataFrame

  /** Cell-group count for the delete key's partition-dir layout: the
    * ≤ 4096 cells fold into 64 directories, so a compaction rewrite
    * touches at worst 1/64 of the corpus per affected group and the
    * partition count stays far under any filesystem's directory
    * limits at 100 TB. */
  private[graft] val CellGroups = 64L

  /** The cell → partition-dir assignment. MUST be a real hash, not
    * `cell % groups` (round 16, measured): cell ids are centroid
    * vec_ids — every stride-th row — so a plain modulo aliases to
    * gcd(stride, groups) groups (at the 2 M corpus stride = 488,
    * gcd(488, 64) = 8: only 8 of 64 dirs existed and every probe
    * touched 1/8 of the corpus instead of 1/64). Derived groups are
    * always COLLECTED from a DataFrame carrying this expression,
    * never recomputed driver-side. */
  private[graft] def pgrpOf(cell: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(cell), lit(CellGroups))

  def queries: Map[String, Q] = Map(
    // TOMBSTONE delete + partition-granular compaction (VERDICT r15
    // task 5 — the missing index-shrink maintenance): a production
    // delete must not rebuild the O(N·k) assignment, and must not
    // rewrite the whole corpus either. This key is the lifecycle end
    // to end:
    //   (1) BUILD the index on the FULL corpus — same assignment plan
    //       as the persisted key, but laid out as a parquet dir
    //       PARTITIONED BY cell-group (pgrp = xxhash64(cell) % 64 —
    //       see [[pgrpOf]] for why a plain modulo aliases — rows
    //       range-clustered and sorted by cell within dirs, so probed
    //       cell INs also prune row groups inside kept dirs) plus the
    //       ≤ 4096-row centroid sidecar: partition dirs are the
    //       rewrite grain a DELETE needs, where the bucketed layout's
    //       grain is the JOIN (buckets cannot be individually
    //       overwritten through any writer API — a layout is chosen
    //       per maintenance story, and this key's story is selective
    //       rewrite).
    //   (2) DELETE the deterministic batch (vec_id % 50 = 17, ~2% —
    //       never a centroid id) as a TOMBSTONE table carrying each
    //       deleted row's (vec_id, cell, pgrp) — located by
    //       re-assigning the batch against the sidecar, O(|batch|·k),
    //       never an index scan. Deletes are metadata: the index
    //       files are untouched.
    //   (3) QUERY phase 'tombstoned': the persisted key's probe job
    //       (sidecar centroids broadcast, probed-cell ids pushed as
    //       literal partition + cell filters — the scan reads ONLY
    //       probed cell-group dirs, PartitionFilters-pruned) with the
    //       tombstones ANTI-JOINED out — a broadcast of |deletes| ids.
    //   (4) COMPACT: rewrite ONLY the affected cell-group partitions
    //       (the distinct pgrp values among the tombstones — a ≤ 64-
    //       long driver materialization, same legitimacy as the
    //       probed-cell ids) with their survivor rows via dynamic
    //       partition overwrite; untouched groups' files are never
    //       read or written. localCheckpoint breaks the read-path
    //       lineage so the overwrite cannot race its own input.
    //   (5) QUERY phase 'compacted': the same probe job with NO
    //       anti-join — the tombstones are physically gone.
    // Both phases must equal a full REBUILD on the survivor corpus
    // (at any scale where the centroid strides coincide — here
    // exactly, since stride = 50 on both sides and no centroid id is
    // ≡ 17 mod 50), so the oracle IS the `llm_sim_topk_ivf` rebuild
    // text over `embeddings WHERE vec_id % 50 <> 17`, cross-joined
    // with the two phase labels: the check that tombstone masking and
    // selective compaction each lost nothing vs rebuilding.
    "llm_sim_topk_ivf_delete" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      // ---- BUILD (full corpus; the delete arrives later). ----
      Pipelines31.cleanStaleIndexes(s)
      val cents = Pipelines31.centroidsOf(e)
      val cells = Pipelines31.assignCells(s, e, cents)
        .withColumn("pgrp", pgrpOf(col("cell")))
      val root = s"${Sinks.sinkRoot(s)}/" +
        Pipelines31.ident(s, "graft_ivf_index_del", d)
      // Range-clustered by (group, cell): dirs hold sorted cell runs,
      // so the probed IN prunes row groups inside kept dirs too.
      val toWrite = cells.repartitionByRange(col("pgrp"), col("cell"))
      toWrite.sortWithinPartitions("cell")
        .write.mode("overwrite").partitionBy("pgrp").parquet(root)
      cents.coalesce(1).write.mode("overwrite").parquet(root + "_cents")
      val sidecar = s.read.parquet(root + "_cents")
      // ---- DELETE: tombstones located via the sidecar, O(|B|·k). ----
      val batch = e.filter(col("vec_id") % 50 === 17)
      Pipelines31.assignCells(s, batch, sidecar)
        .select(col("vec_id"), col("cell"),
                pgrpOf(col("cell")).as("pgrp"))
        .coalesce(1).write.mode("overwrite").parquet(root + "_tomb")
      val tomb = s.read.parquet(root + "_tomb")
      // ---- the shared probe job ([[Pipelines31.probeTopk]] — one
      // Spark-side copy across the persisted/append/delete keys):
      // this key's refine adds the partition-dir filter (groups
      // derived through the writer's own pgrpOf expression, never
      // driver arithmetic) and the tombstone anti-join. ----
      def queryIndex(withTombstones: Boolean): DataFrame =
        Pipelines31.probeTopk(s, s.read.parquet(root), sidecar,
          probed => {
            val probedGroups = s.range(1)
              .select(explode(lit(probed)).as("cell"))
              .select(pgrpOf(col("cell")))
              .distinct().collect().map(_.getLong(0)).sorted
            val scan0 = s.read.parquet(root)
              .filter(col("pgrp").isin(probedGroups: _*) &&
                      col("cell").isin(probed.toSeq: _*))
            if (withTombstones)
              scan0.join(broadcast(tomb.select("vec_id")),
                         Seq("vec_id"), "left_anti")
            else scan0
          })
      // Phase 1 materializes (≤ 30 rows) BEFORE compaction rewrites
      // the files its lazy plan would otherwise re-list.
      val tombstoned = queryIndex(withTombstones = true).localCheckpoint()
      // ---- COMPACT: survivors of the ≤ 64 affected groups only. ----
      val affected = tomb.select("pgrp").distinct()
        .collect().map(_.getLong(0)).sorted
      val survivors = s.read.parquet(root)
        .filter(col("pgrp").isin(affected: _*))
        .join(broadcast(tomb.select("vec_id")), Seq("vec_id"), "left_anti")
        .localCheckpoint()
      val toRewrite = survivors.repartitionByRange(col("pgrp"), col("cell"))
      toRewrite.sortWithinPartitions("cell")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pgrp").parquet(root)
      // Dynamic overwrite only rewrites groups PRESENT in the data: an
      // affected group whose every row was tombstoned emits no rows,
      // so its stale dir must be dropped explicitly (a table format's
      // manifest would do this; on raw dirs it is ≤ 64 bounded
      // deletes). Cannot occur at the fixtures (every group keeps
      // survivors) — the guard is the at-scale correctness edge.
      val liveGroups = survivors.select("pgrp").distinct()
        .collect().map(_.get(0).toString.toLong).toSet
      affected.filterNot(liveGroups).foreach(g => Pipelines31.rmRf(
        new java.io.File(root.stripPrefix("file:"), s"pgrp=$g")))
      val compacted = queryIndex(withTombstones = false)
      tombstoned.withColumn("phase", lit("tombstoned"))
        .unionAll(compacted.withColumn("phase", lit("compacted")))
        .select("phase", "probe_id", "neighbor_id", "cos_sim", "rnk")
        .orderBy("phase", "probe_id", "rnk")
    }),

    // CENTROID-DRIFT audit (VERDICT r15 task 6 — the rebuild trigger
    // metric the append key's "rebuild per corpus version, append per
    // batch" contract needs): the append key serves appended batches
    // from the EXISTING centroid set, so its recall erodes exactly as
    // fast as appended vectors land far from every centroid. The
    // leading indicator is the assigned-cosine distribution — each
    // vector's similarity to its OWN cell's centroid — compared
    // between the appended batch and the base build: when the batch's
    // mean/deciles sag below the base's, the quantizer no longer
    // represents the new data and the O(N·k) rebuild is due. Shape =
    // the recall-audit pattern: a bounded audited set (the ~2% batch
    // + a deterministic 5% base sample — the base reference is a
    // distribution, a fixed sample suffices and keeps the audit
    // O((|batch| + N/20)·k) instead of O(N·k) at any corpus size)
    // broadcast-joined against the ≤ 4096 base centroids, one
    // hash-aggregate per cohort. Integer micro-units throughout; the
    // decile at p is the value at ascending-rank position
    // floor(p·n/10) (rn·10 ≤ n·p — engine-identical integer
    // arithmetic), and the mean shifts by +10⁴ before `div` so the
    // truncated division never sees a negative numerator (Spark `div`
    // truncates toward zero, DuckDB `//` floors — they agree on
    // non-negatives, §2.0).
    "llm_ivf_drift_audit" -> ((s, d) => {
      graft.functions.CosineSimilarity.register(s)
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val base = e.filter(col("vec_id") % 50 =!= 17)
      val cents = Pipelines31.centroidsOf(base)
      val audited = e.filter(col("vec_id") % 50 === 17)
        .withColumn("cohort", lit("appended"))
        .unionAll(base.filter(col("vec_id") % 20 === 3)
          .withColumn("cohort", lit("base_sample")))
      val best = audited.join(broadcast(cents))
        .select(col("cohort"), col("vec_id"),
                (round(expr("graft_cosine_sim(embedding, ce)"), 4) + 0.0)
                  .as("cs"))
        .groupBy("cohort", "vec_id")
        .agg(max("cs").as("cs"))
        .withColumn("micro", expr("cast(round(cs * 10000) as bigint)"))
      val wR = Window.partitionBy("cohort")
        .orderBy(asc("micro"), asc("vec_id"))
      val ranked = best
        .withColumn("rn", row_number().over(wR).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("cohort")))
      val deciles = (1 to 9).map(k =>
        max(when(col("rn") * 10 <= col("n") * k, col("micro")))
          .as(s"p${k * 10}_micro"))
      val aggs = Seq(
        count(lit(1)).as("n_vecs"),
        (expr("sum(micro + 10000) div count(1)") - 10000L)
          .as("mean_micro")) ++ deciles
      ranked.groupBy("cohort").agg(aggs.head, aggs.tail: _*)
        .orderBy("cohort")
    })
  )

  def oracles: Map[String, String] = Map(
    // The rebuild-on-survivors text VERBATIM (the append key's proof
    // pattern): Pipelines4's factored IVF CTE chain instantiated over
    // the survivor corpus, cross-joined with the two phase labels —
    // tombstone masking and selective compaction must each reproduce
    // what rebuilding from scratch on the survivors would.
    "llm_sim_topk_ivf_delete" ->
      s"""WITH surv AS (
           SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 50 <> 17
         ),
         ${Pipelines4.duckIvfCandCtes("surv")},
         top3 AS (
           SELECT probe_id, neighbor_id, cos_sim,
                  row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cos_sim DESC, neighbor_id)
                    AS rnk
           FROM cand
           QUALIFY rnk <= 3
         )
         SELECT ph.phase, t.probe_id, t.neighbor_id, t.cos_sim, t.rnk
         FROM top3 t CROSS JOIN (
           SELECT unnest(['compacted', 'tombstoned']) AS phase) ph
         ORDER BY phase, probe_id, rnk""",

    "llm_ivf_drift_audit" ->
      """WITH base AS (
           SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 50 <> 17
         ),
         bsv AS (
           SELECT greatest(50, count(*) // 4096) AS stride FROM base
         ),
         norms AS (
           SELECT vec_id, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    AS nrm
           FROM embeddings
         ),
         cents AS (
           SELECT n.vec_id AS cent_id, n.embedding AS ce, n.nrm AS cnrm
           FROM norms n, bsv
           WHERE n.vec_id % 50 <> 17 AND n.vec_id % bsv.stride = 0
         ),
         aud AS (
           SELECT 'appended' AS cohort, vec_id, embedding, nrm
           FROM norms WHERE vec_id % 50 = 17
           UNION ALL
           SELECT 'base_sample' AS cohort, vec_id, embedding, nrm
           FROM norms WHERE vec_id % 50 <> 17 AND vec_id % 20 = 3
         ),
         best AS (
           SELECT a.cohort, a.vec_id,
                  max(round(list_aggregate(
                        list_transform(list_zip(a.embedding, c.ce),
                          z -> CAST(z[1] AS DOUBLE) *
                               CAST(z[2] AS DOUBLE)), 'sum')
                      / (a.nrm * c.cnrm), 4) + 0.0) AS cs
           FROM aud a CROSS JOIN cents c
           GROUP BY a.cohort, a.vec_id
         ),
         m AS (
           SELECT cohort, vec_id,
                  CAST(round(cs * 10000) AS BIGINT) AS micro
           FROM best
         ),
         r AS (
           SELECT cohort, micro,
                  row_number() OVER (PARTITION BY cohort
                                     ORDER BY micro, vec_id) AS rn,
                  count(*) OVER (PARTITION BY cohort) AS n
           FROM m
         )
         SELECT cohort, count(*) AS n_vecs,
                CAST(sum(micro + 10000) // count(*) AS BIGINT) - 10000
                  AS mean_micro,
                max(CASE WHEN rn * 10 <= n * 1 THEN micro END) AS p10_micro,
                max(CASE WHEN rn * 10 <= n * 2 THEN micro END) AS p20_micro,
                max(CASE WHEN rn * 10 <= n * 3 THEN micro END) AS p30_micro,
                max(CASE WHEN rn * 10 <= n * 4 THEN micro END) AS p40_micro,
                max(CASE WHEN rn * 10 <= n * 5 THEN micro END) AS p50_micro,
                max(CASE WHEN rn * 10 <= n * 6 THEN micro END) AS p60_micro,
                max(CASE WHEN rn * 10 <= n * 7 THEN micro END) AS p70_micro,
                max(CASE WHEN rn * 10 <= n * 8 THEN micro END) AS p80_micro,
                max(CASE WHEN rn * 10 <= n * 9 THEN micro END) AS p90_micro
         FROM r GROUP BY cohort ORDER BY cohort"""
  )
}
