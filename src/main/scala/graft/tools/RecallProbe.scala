package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted near-duplicate recall probe for the embedding-dedup keys.
  *
  * The fixture-scale recall audits (`llm_dedup_lsh_recall`,
  * `llm_minhash_jaccard_audit`) measure each sketch against exact
  * ground truth on a sample — affordable because the corpus is small.
  * At probe scale the exact pair space is gone, so this probe turns
  * the construction around: it PLANTS the ground truth. The corpus is
  * the embeddings-iid construction (a signed-permutation isometry per
  * copy — see ScaleProbe) where every vector additionally gets a
  * deterministic JITTERED TWIN: the coordinate at
  * pmod(xxhash64(copy, vec_id), 64) is negated, so
  * cos(v, twin) = 1 − 2·v_j²/‖v‖² — ≈ 0.94–0.97 on the fixture's
  * coordinate mass, i.e. a production-grade near-duplicate (τ ≈ 0.95
  * regime), with the pair's ids known by construction (twin id =
  * vec id + 500000 inside the copy's id block). A dedup key's
  * PLANTED RECALL is then the fraction of twin pairs that survive its
  * blocking and threshold — the at-scale answer to "what does the
  * candidate-generation stage actually lose?", measured rather than
  * argued. (Pairs can also be lost to the threshold itself when the
  * negated coordinate carries > 14.4% of the vector's mass —
  * cos < 0.7-ish never happens here since max coordinate mass in the
  * fixture is ~3.3% of ‖v‖² — so losses are attributable to routing.)
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir> <outDir> [xN] key...
  * Keys must read embeddings and output pair rows (a_id, b_id).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val (copies, keys) = args.drop(2) match {
      case a if a.nonEmpty && a.head.matches("x\\d+") =>
        (a.head.drop(1).toInt, a.tail)
      case a => (10, a)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .select(col("vec_id"), col("copy"), col("label"),
        // signed coordinate permutation per copy (ScaleProbe's
        // embeddings-iid construction, verbatim)
        expr("""transform(
                  transform(
                    array_sort(transform(sequence(0, 63),
                      i -> struct(xxhash64(copy, i) AS h, i AS i))),
                    p -> p.i),
                  (src, j) ->
                    cast(if(xxhash64(copy, 64 + j) % 2 = 0, 1.0d, -1.0d)
                         * element_at(embedding, src + 1) AS float))""")
          .as("pe"))
    val orig = base.select(
      (col("vec_id") + col("copy").cast("long") * lit(1000000L))
        .as("vec_id"),
      col("pe").as("embedding"), col("label"))
    val twin = base.select(
      (col("vec_id") + lit(500000L) + col("copy").cast("long") * lit(1000000L))
        .as("vec_id"),
      expr("""transform(pe, (x, j) ->
                cast(if(j = pmod(xxhash64(copy, vec_id), 64), -x, x)
                     AS float))""").as("embedding"),
      col("label"))
    orig.unionAll(twin).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val nPlanted = orig.count()
    println(f"RECALLPROBE gen ${copies}x: ${2 * nPlanted} vectors, " +
      f"$nPlanted planted twin pairs, ${(System.nanoTime() - t0) / 1e9}%.1f s")

    keys.foreach { k =>
      val t = System.nanoTime()
      val out = graft.SparkEntry.queries(k)(spark, outDir)
        .select(col("a_id"), col("b_id")).localCheckpoint()
      val sec = (System.nanoTime() - t) / 1e9
      val rows = out.count()
      val hit = out.filter(col("b_id") === col("a_id") + 500000L &&
                           expr("a_id % 1000000 < 500000")).count()
      println(f"RECALLPROBE $k $sec%.1f s, $rows rows, " +
        f"planted recall $hit/$nPlanted = ${hit.toDouble / nPlanted}%.3f")
    }
    spark.stop()
  }
}
