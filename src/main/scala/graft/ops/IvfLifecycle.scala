package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Round-17 — ONE persisted IVF index artifact threaded through the
  * whole lifecycle (VERDICT r16 task 3 / missing item 3): the
  * `llm_sim_topk_ivf_persisted` / `_append` / `_delete` /
  * `llm_ivf_drift_audit` keys previously each rebuilt their own
  * O(N·k) cell assignment per invocation — three full builds per
  * bench run, where a production pipeline pays the build once per
  * corpus version and threads the SAME index through
  * append → drift-audit → delete → compact.
  *
  * The shared artifact is built at most once per (application,
  * dataset) and is IMMUTABLE afterwards — maintenance keys write
  * their own overlays (tombstone table, compacted partitions) beside
  * it, never into it, so the keys stay order-independent and
  * re-runnable (BenchOne MIX repeats a single key 20×; nothing may
  * depend on which lifecycle key ran first). Pieces:
  *
  *  - `<stem>_cents` — the ≤ 4096-row centroid SIDECAR, derived from
  *    the BASE corpus (every vector except the deterministic append
  *    batch, vec_id % 50 = 17). Written FIRST: it is the single
  *    assignment authority for every other piece (round 16's weak-key
  *    conversion, kept).
  *  - `<stem>` — the BASE segment: the base corpus assigned against
  *    the sidecar (the one O(N·k) pass), laid out as a parquet dir
  *    PARTITIONED BY cell-group (pgrp = xxhash64(cell) % 64,
  *    [[Pipelines32.pgrpOf]]) with write tasks range-clustered and
  *    sorted on cell, so probed-cell INs prune partition dirs AND row
  *    groups (both measured in round 16 — BytesProbe: decode volume
  *    ∝ probed-cell fraction).
  *  - `<stem>_delta` — the APPEND segment: the batch assigned against
  *    the SIDECAR (O(|batch|·k), never an index scan — the r15→r16
  *    append contract), same layout. The full-corpus index IS
  *    base ∪ delta — the immutable-segment-plus-delta file set every
  *    log-structured table format serves reads from.
  *  - a BUCKETED catalog twin ([[resolveBucketed]]), built from the
  *    segments by RE-LAYOUT (no second assignment): base written
  *    bucketed-by-cell, delta bucket-APPENDED — the construction is
  *    itself the incremental-append maintenance path, done once.
  *
  * Scale note (ADVICE r16 item 1): the sidecar holds BASE-derived
  * centroids (stride = max(50, |base| div 4096)), while the
  * `_persisted`/`_append`/`_delete` DuckDB oracles derive centroids
  * from their own corpus (full resp. survivors). The sets coincide
  * exactly while stride(base) = stride(full) and no centroid id is
  * ≡ 17 (mod 50) — true at every fixture and at the 204 800-row
  * bench cap (204 800 div 4096 = 50 = the stride floor). Past the
  * switchover the index correctly serves its EXISTING centroids (the
  * standard IVF maintenance semantics) but the differential check
  * would diverge, so the build emits a loud stderr warning instead
  * of a silent hash mismatch.
  */
object IvfLifecycle {

  /** Handle to the built artifact. `schema` pins the pgrp partition
    * column to BIGINT at the source (ADVICE r16 item 3: directory
    * partition-type inference reads `pgrp=42` back as INT, and every
    * downstream `isin(Long)` then leans on cast-unwrapping for its
    * partition pruning — a user-supplied schema gives all readers one
    * stable type with pruning intact). */
  final case class Shared(baseRoot: String, deltaRoot: String,
                          centsRoot: String, schema: StructType,
                          nBase: Long, nDelta: Long) {
    def sidecar(s: SparkSession): DataFrame = s.read.parquet(centsRoot)
    def segment(s: SparkSession, root: String): DataFrame =
      s.read.schema(schema).parquet(root)
    def baseSeg(s: SparkSession): DataFrame = segment(s, baseRoot)
    def deltaSeg(s: SparkSession): DataFrame = segment(s, deltaRoot)
    /** The full-corpus index: immutable base segment + appended delta. */
    def fullIndex(s: SparkSession): DataFrame =
      baseSeg(s).unionAll(deltaSeg(s))
    /** The post-compaction MANIFEST view — the one copy of the COW
      * rule (round 17, review): unaffected cell-groups served from
      * the shared segments, affected groups from the compaction's own
      * root. A fully-tombstoned group simply has no files on the
      * compact side and is excluded from the shared side by the
      * partition filter — no directory deletion on any filesystem.
      * Shared by the delete key and DeleteProbe; Round16Spec keeps an
      * independent re-derivation as the pin. */
    def compactedView(s: SparkSession, compactRoot: String,
                      affected: Seq[Long]): DataFrame =
      fullIndex(s).filter(!col("pgrp").isin(affected: _*))
        .unionAll(segment(s, compactRoot))
  }

  private val built =
    scala.collection.mutable.Map[(String, String), Shared]()
  private val builtBucketed =
    scala.collection.mutable.Map[(String, String), String]()

  private def cacheKey(s: SparkSession, d: String): (String, String) =
    (s.sparkContext.applicationId, d)

  private[graft] def stem(s: SparkSession, d: String): String =
    s"${Sinks.sinkRoot(s)}/" + Pipelines31.ident(s, "graft_ivf_index_lc", d)

  /** Build-if-absent, then reuse for the life of the application.
    * Whichever lifecycle key runs first pays the one O(N·k) build;
    * the rest read. */
  def resolve(s: SparkSession, d: String): Shared = synchronized {
    built.getOrElseUpdate(cacheKey(s, d), build(s, d))
  }

  private def build(s: SparkSession, d: String): Shared = {
    Pipelines31.cleanStaleIndexes(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val base = e.filter(col("vec_id") % 50 =!= 17)
    val batch = e.filter(col("vec_id") % 50 === 17)
    val baseRoot = stem(s, d)
    val deltaRoot = baseRoot + "_delta"
    val centsRoot = baseRoot + "_cents"
    Pipelines31.centroidsOf(base).coalesce(1)
      .write.mode("overwrite").parquet(centsRoot)
    val sidecar = s.read.parquet(centsRoot)
    def layout(rows: DataFrame): DataFrame =
      Pipelines31.assignCells(s, rows, sidecar)
        .withColumn("pgrp", Pipelines32.pgrpOf(col("cell")))
        .repartitionByRange(col("pgrp"), col("cell"))
        .sortWithinPartitions("cell")
    layout(base).write.mode("overwrite")
      .partitionBy("pgrp").parquet(baseRoot)
    layout(batch).write.mode("overwrite")
      .partitionBy("pgrp").parquet(deltaRoot)
    val inferred = s.read.parquet(baseRoot).schema
    val schema = StructType(inferred.map(f =>
      if (f.name == "pgrp") StructField("pgrp", LongType, f.nullable)
      else f))
    // Parquet-metadata-only counts; they also feed the bucketed
    // twin's write-time bucket derivation.
    val nBase = s.read.schema(schema).parquet(baseRoot).count()
    val nDelta = s.read.schema(schema).parquet(deltaRoot).count()
    val strideBase = math.max(50L, nBase / 4096L)
    val strideFull = math.max(50L, (nBase + nDelta) / 4096L)
    if (strideBase != strideFull)
      // See the scale note in the class doc: index semantics stay
      // correct (existing centroids are served), but the full-rebuild
      // DuckDB oracles diverge here — fail loudly in logs, not as a
      // silent hash mismatch in a differential run.
      System.err.println(
        s"GRAFT WARN IvfLifecycle($d): stride(base)=$strideBase != " +
        s"stride(full)=$strideFull — lifecycle keys serve the base " +
        "sidecar's centroids; full-rebuild oracles are only exact " +
        "below the 4096-cell stride switchover.")
    Shared(baseRoot, deltaRoot, centsRoot, schema, nBase, nDelta)
  }

  /** The bucketed catalog twin of the shared index (the
    * `llm_sim_topk_ivf_persisted`/`_append` read layout: cell-bucket
    * pruning via SelectedBucketsCount + sorted row groups): a
    * RE-LAYOUT of the already-assigned segments — one corpus read +
    * bucketed write, no second O(N·k) scoring pass — with the delta
    * segment bucket-APPENDED after the base overwrite, so the table's
    * own construction is the incremental-append path the `_append`
    * key declares. Returns (table name, sidecar). */
  def resolveBucketed(s: SparkSession, d: String): (String, DataFrame) =
    synchronized {
      val sh = resolve(s, d)
      val tbl = builtBucketed.getOrElseUpdate(cacheKey(s, d), {
        val name = Pipelines31.ident(s, "graft_ivf_index", d)
        val n = sh.nBase + sh.nDelta
        val nb = Pipelines31.ivfNumBuckets(n)
        // Fixture scale: one writer task per segment keeps file count
        // at ≤ |buckets| per segment (the tiny-file × task guard);
        // past it the write runs range-clustered at full parallelism
        // so row groups stay narrow on cell (round 16, measured).
        def seg(df: DataFrame): DataFrame = {
          val projected = df.select("vec_id", "embedding", "cell")
          if (n <= 250000L) projected.coalesce(1)
          else projected.repartitionByRange(col("cell"))
        }
        seg(sh.baseSeg(s)).write.mode("overwrite")
          .bucketBy(nb, "cell").sortBy("cell")
          .option("path", s"${Sinks.sinkRoot(s)}/$name")
          .saveAsTable(name)
        seg(sh.deltaSeg(s)).write.mode("append")
          .bucketBy(nb, "cell").sortBy("cell")
          .saveAsTable(name)
        name
      })
      (tbl, sh.sidecar(s))
    }
}
