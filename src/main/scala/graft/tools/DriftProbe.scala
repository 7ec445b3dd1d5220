package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drift-audit demonstration probe (round 16 — the evidence behind
  * `llm_ivf_drift_audit`'s rebuild-trigger claim): the audit is only a
  * trigger if its metric MOVES when the appended batch genuinely
  * drifts and HOLDS when it doesn't.
  *
  * Drift is relative to the quantizer's represented DENSITY, not to
  * the vectors themselves: on an isotropic base (the iid fixtures, or
  * the signed-permutation twin corpora — measured: a coordinate
  * rotation of the batch moved the mean micro-cosine 4354 → 4351 on
  * the 2 M twin corpus, i.e. nothing, because that corpus is closed
  * under permutations and has no density structure beyond the planted
  * pairs) NO statistic of assigned-cosine can move. So this probe
  * synthesizes a CLUSTERED corpus — the structure real embedding
  * corpora have — from the fixture embeddings as cluster centers:
  *
  *  - base: members = 0.9·center + 0.1·hash-jitter, `copies` members
  *    per center (md5-arithmetic jitter, fully deterministic);
  *  - `appended`: more members of the SAME clusters (a held-out
  *    member index range) — the audit must read ≈ base;
  *  - `appended_drifted`: pure hash-direction vectors (no cluster
  *    membership) — individually plausible norms, but outside every
  *    density region the quantizer was built on; the audit must sag.
  *
  * Output = the declared key's exact statistic (assigned-cosine
  * integer-micro mean + p10/p50/p90 vs the base centroids, base
  * sampled 5 %).
  *
  * Usage: runMain graft.tools.DriftProbe <dir> [copies=100]
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CosineSimilarity.register(spark)

    val centers = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce0"))
    // Deterministic per-(member, coord) jitter in [-1, 1]: the repo's
    // md5-arithmetic chain.
    def jittered(memberLo: Int, memberHi: Int): DataFrame =
      centers
        .select(col("c_id"), col("ce0"),
                explode(expr(s"sequence($memberLo, ${memberHi - 1})"))
                  .as("m"))
        .select(
          (col("c_id") * 10000 + col("m")).as("vec_id"),
          expr("""transform(ce0, (x, i) -> cast(
                    0.9d * x + 0.1d * 0.3d * (
                      (conv(substring(md5(concat(c_id, '-', m, '-', i)),
                            1, 8), 16, 10) % 2001 - 1000) / 1000.0d)
                    as float))""").as("embedding"))
    val base = jittered(0, copies)
    val cents = graft.ops.Pipelines31.centroidsOf(base).localCheckpoint()
    val k = cents.count()
    // In-distribution append: held-out member range of the same
    // clusters. Drifted append: pure hash directions, same norm scale.
    val batchIn = jittered(copies, copies + 2)
      .withColumn("cohort", lit("appended"))
    val batchDrift = jittered(copies, copies + 2)
      .select(col("vec_id"),
        expr("""transform(embedding, (x, i) -> cast(0.3d * (
                  (conv(substring(md5(concat('drift-', vec_id, '-', i)),
                        1, 8), 16, 10) % 2001 - 1000) / 1000.0d)
                as float))""").as("embedding"))
      .withColumn("cohort", lit("appended_drifted"))
    val audited = batchIn.unionAll(batchDrift)
      .unionAll(base.filter(col("vec_id") % 20 === 3)
        .withColumn("cohort", lit("base_sample")))
    val t0 = System.nanoTime()
    val best = audited.join(broadcast(cents))
      .select(col("cohort"), col("vec_id"),
              (round(expr("graft_cosine_sim(embedding, ce)"), 4) + 0.0)
                .as("cs"))
      .groupBy("cohort", "vec_id").agg(max("cs").as("cs"))
      .withColumn("micro", expr("cast(round(cs * 10000) as bigint)"))
    val wR = Window.partitionBy("cohort").orderBy(asc("micro"), asc("vec_id"))
    val ranked = best
      .withColumn("rn", row_number().over(wR).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("cohort")))
    val out = ranked.groupBy("cohort").agg(
        count(lit(1)).as("n_vecs"),
        (expr("sum(micro + 10000) div count(1)") - 10000L).as("mean"),
        max(when(col("rn") * 10 <= col("n") * 1, col("micro"))).as("p10"),
        max(when(col("rn") * 10 <= col("n") * 5, col("micro"))).as("p50"),
        max(when(col("rn") * 10 <= col("n") * 9, col("micro"))).as("p90"))
      .orderBy("cohort").collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"DRIFTPROBE k=$k audit $sec%.1f s " +
      "(cohort, n, mean/p10/p50/p90 micro-cosine):")
    out.foreach(r => println(
      f"DRIFTPROBE ${r.getString(0)}%-17s n=${r.getLong(1)} " +
      f"mean=${r.getLong(2)} p10=${r.getLong(3)} p50=${r.getLong(4)} " +
      f"p90=${r.getLong(5)}"))
    spark.stop()
  }
}
