package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: how do the documents-only flagship operators behave
  * at 10× the bench corpus?
  *
  * Builds a 50 000-doc corpus from sf0.1 by stamping 10 copies with a
  * per-copy tag token INTERLEAVED between every original token. The
  * interleave is the point: within a copy every doc undergoes the
  * same transformation, so the copy's internal duplicate structure
  * (exact clusters, near-dup clusters, shingle dfs) is preserved
  * exactly; across copies every 3-gram shingle contains the copy tag,
  * so shingle spaces are DISJOINT and the 10× corpus is 10
  * independent shards of the original — the honest scale-up shape
  * (more of the same data), not 10× artificial duplication (which
  * would square the pair outputs and measure the synthetic blowup,
  * not the operator).
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> <outDir> [xN] <key...>
  * (optional first key arg `x<copies>` overrides the default 10×).
  */
object ScaleProbe {
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
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .select(
        (col("doc_id") + col("copy").cast("long") * lit(1000000L)).as("doc_id"),
        array_join(
          transform(split(col("text"), " "),
            x => concat_ws(" ", x, concat(lit("zz"), col("copy")))),
          " ").as("text"),
        col("lang"),
        col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(f"PROBE gen${copies}x ${(System.nanoTime() - t0) / 1e9}%.2f s")

    keys.foreach { k =>
      val t = System.nanoTime()
      val n = graft.SparkEntry.queries(k)(spark, outDir).count()
      println(f"PROBE $k ${(System.nanoTime() - t) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
