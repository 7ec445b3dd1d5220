package graft.tools

import org.apache.spark.sql.SparkSession

/** Delete-lifecycle probe at corpus scale (round 16 — evidence behind
  * `llm_sim_topk_ivf_delete`): runs the DECLARED key verbatim against
  * a large embeddings dir, then audits the sink layout it left
  * behind — per-phase wall time comes from the key's own jobs, and the
  * selective-compaction claim ("rewrites ONLY the affected cell-group
  * dirs") is checked on the filesystem: a dir whose newest file
  * predates the tombstone write was NOT rewritten.
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

    val root = new java.io.File(
      graft.ops.Sinks.sinkRoot(spark) + "/" +
        graft.ops.Pipelines31.ident(spark, "graft_ivf_index_del", dir))
    val tombNewest = {
      def newest(f: java.io.File): Long =
        (f.lastModified() +: Option(f.listFiles()).toSeq.flatten
          .map(newest)).max
      newest(new java.io.File(root.getPath + "_tomb"))
    }
    val dirs = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("pgrp="))
    def newestIn(f: java.io.File): Long =
      Option(f.listFiles()).toSeq.flatten.map(_.lastModified())
        .foldLeft(f.lastModified())(math.max)
    val rewritten = dirs.count(d => newestIn(d) > tombNewest)
    val untouched = dirs.size - rewritten
    val tomb = spark.read.parquet(root.getPath + "_tomb")
    val affected = tomb.select("pgrp").distinct().count()
    val idx = spark.read.parquet(root.getPath)
    println(f"DELETEPROBE layout: ${dirs.size} cell-group dirs, " +
      f"$affected affected by ${tomb.count()} tombstones -> " +
      f"$rewritten dirs rewritten after the tombstone write, " +
      f"$untouched untouched (claim: rewritten == affected)")
    println(f"DELETEPROBE survivors on disk: ${idx.count()} rows, " +
      f"tombstoned remaining: " +
      idx.join(tomb.select("vec_id"), Seq("vec_id"), "left_semi").count())

    // NARROW delete (the realistic takedown shape: one source = few
    // clusters = few cells — the declared key's %50 batch is isotropic
    // and touches every group by construction): tombstone ALL rows of
    // the 10 smallest cells, compact, and audit that ONLY their ≤ 10
    // group dirs were rewritten — compaction cost ∝ the delete's cell
    // footprint, which is the selective-rewrite claim at scale.
    import org.apache.spark.sql.functions._
    val tenCells = idx.select("cell").distinct().orderBy("cell")
      .limit(10).collect().map(_.getLong(0)).toSeq
    val t1 = System.nanoTime()
    val tomb2 = idx.filter(col("cell").isin(tenCells: _*))
      .select(col("vec_id"), col("cell"),
              graft.ops.Pipelines32.pgrpOf(col("cell")).as("pgrp"))
      .localCheckpoint()
    val affected2 = tomb2.select("pgrp").distinct()
      .collect().map(_.get(0).toString.toLong).sorted
    val before = dirs.map(d => d.getName -> newestIn(d)).toMap
    val survivors2 = spark.read.parquet(root.getPath)
      .filter(col("pgrp").isin(affected2: _*))
      .join(broadcast(tomb2.select("vec_id")), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    survivors2.repartitionByRange(col("pgrp"), col("cell"))
      .sortWithinPartitions("cell")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pgrp").parquet(root.getPath)
    val sec2 = (System.nanoTime() - t1) / 1e9
    val rewritten2 = dirs.filter(d => newestIn(d) > before(d.getName))
    println(f"DELETEPROBE narrow delete: ${tomb2.count()} rows in " +
      f"${tenCells.size} cells -> ${affected2.length} affected groups, " +
      f"compaction $sec2%.1f s rewrote ${rewritten2.size}/${dirs.size} " +
      f"dirs (${rewritten2.map(_.getName).sorted.mkString(",")})")
    val idx2 = spark.read.parquet(root.getPath)
    println(f"DELETEPROBE narrow survivors: ${idx2.count()} rows, " +
      f"tombstoned remaining: " +
      idx2.join(tomb2.select("vec_id"), Seq("vec_id"), "left_semi").count())
    spark.stop()
  }
}
