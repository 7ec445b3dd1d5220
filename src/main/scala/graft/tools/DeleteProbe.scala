package graft.tools

import org.apache.spark.sql.SparkSession

/** Delete-lifecycle probe at corpus scale (round 16, re-based round 17
  * on the shared lifecycle artifact — evidence behind
  * `llm_sim_topk_ivf_delete`): runs the DECLARED key verbatim against
  * a large embeddings dir, then audits the copy-on-write layout it
  * left behind:
  *
  *  - the SHARED segments must be byte-untouched (deletes are
  *    metadata + COW rewrites beside the index, never mutations of
  *    it) — checked by mtime: no shared file may postdate the
  *    tombstone write;
  *  - the compact root must hold exactly the affected cell-group
  *    partitions' survivors ("rewrites ONLY the affected dirs").
  *
  * A second, NARROW delete (the realistic takedown shape: one source
  * = few clusters = few cells — the declared key's %50 batch is
  * isotropic and touches every group by construction) measures
  * compaction cost ∝ the delete's cell footprint: tombstone ALL rows
  * of the 10 smallest cells and COW-rewrite their ≤ 10 groups.
  *
  * Usage: runMain graft.tools.DeleteProbe <dir>
  */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries("llm_sim_topk_ivf_delete")(spark, dir)
    val rows = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"DELETEPROBE full lifecycle $sec%.1f s, $rows output rows")

    val sh = graft.ops.IvfLifecycle.resolve(spark, dir)
    val stem = graft.ops.Sinks.sinkRoot(spark) + "/" +
      graft.ops.Pipelines31.ident(spark, "graft_ivf_index_del", dir)
    def newest(f: java.io.File): Long =
      graft.ops.Pipelines31.newestMtime(f)
    def groupDirs(root: String): Seq[java.io.File] =
      Option(new java.io.File(root).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("pgrp="))
    val tombNewest = newest(new java.io.File(stem + "_tomb"))
    val sharedTouched =
      (groupDirs(sh.baseRoot) ++ groupDirs(sh.deltaRoot))
        .count(d => newest(d) > tombNewest)
    val tomb = spark.read.parquet(stem + "_tomb")
    val affected = tomb.select("pgrp").distinct().count()
    val cowDirs = groupDirs(stem + "_compact")
    println(f"DELETEPROBE layout: ${groupDirs(sh.baseRoot).size} shared " +
      f"cell-group dirs, $affected affected by ${tomb.count()} " +
      f"tombstones -> ${cowDirs.size} dirs COW-written " +
      f"(claim: written == affected), $sharedTouched shared dirs " +
      "modified (claim: 0 — the artifact is immutable)")
    import org.apache.spark.sql.functions._
    val affectedIds = tomb.select("pgrp").distinct()
      .collect().map(_.getLong(0)).sorted
    val compactedView =
      sh.compactedView(spark, stem + "_compact", affectedIds)
    println(f"DELETEPROBE compacted view: ${compactedView.count()} rows, " +
      "tombstoned remaining: " +
      compactedView.join(tomb.select("vec_id"), Seq("vec_id"), "left_semi")
        .count())

    // NARROW delete: cost ∝ the takedown's cell footprint.
    val full = sh.fullIndex(spark)
    val tenCells = full.select("cell").distinct().orderBy("cell")
      .limit(10).collect().map(_.getLong(0)).toSeq
    val t1 = System.nanoTime()
    val tomb2 = full.filter(col("cell").isin(tenCells: _*))
      .select("vec_id", "cell", "pgrp")
      .localCheckpoint()
    val affected2 = tomb2.select("pgrp").distinct()
      .collect().map(_.getLong(0)).sorted
    val narrowRoot = stem + "_compact_narrow"
    full.filter(col("pgrp").isin(affected2: _*))
      .join(tomb2.select("vec_id"), Seq("vec_id"), "left_anti")
      .repartitionByRange(col("pgrp"), col("cell"))
      .sortWithinPartitions("cell")
      .write.mode("overwrite").partitionBy("pgrp").parquet(narrowRoot)
    val sec2 = (System.nanoTime() - t1) / 1e9
    val written2 = groupDirs(narrowRoot)
    println(f"DELETEPROBE narrow delete: ${tomb2.count()} rows in " +
      f"${tenCells.size} cells -> ${affected2.length} affected groups, " +
      f"COW compaction $sec2%.1f s wrote ${written2.size}/" +
      f"${groupDirs(sh.baseRoot).size} dirs " +
      f"(${written2.map(_.getName).sorted.mkString(",")})")
    val narrowView = sh.compactedView(spark, narrowRoot, affected2)
    println(f"DELETEPROBE narrow survivors: ${narrowView.count()} rows, " +
      "tombstoned remaining: " +
      narrowView.join(tomb2.select("vec_id"), Seq("vec_id"), "left_semi")
        .count())
    spark.stop()
  }
}
