package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: how do the flagship operators behave at N× the bench
  * corpus? Three generation modes, one per probed fixture family —
  * each constructed so "more data" carries the ADVERSARIAL shape for
  * its operator family, not just more uniform rows:
  *
  *  - `docs` (default): N tag-interleaved copies of documents. Within
  *    a copy every doc undergoes the same transformation, so each
  *    copy's internal duplicate structure is preserved exactly; every
  *    3-gram shingle contains the copy tag, so SHINGLE spaces are
  *    disjoint (N independent shards — the honest scale-up for
  *    shingle-level keys), while token SETS stay ~identical across
  *    copies (near-dup clusters grown N× — the hub regime for
  *    token-level keys). One probe measures both regimes at once.
  *
  *  - `events`: N copies of events with globally unique event_ids;
  *    ~1% of users (user_id ≡ 0 mod 97) keep their ORIGINAL id in
  *    every copy — their per-user timelines grow N× (hub users: the
  *    skew regime for user-partitioned windows, sessionization and
  *    funnels) — while the rest shift per copy (uniform shard
  *    growth). Timestamps are unchanged, so the time axis densifies
  *    the way a higher-traffic day would.
  *
  *  - `embeddings`: N copies of embeddings with unique vec_ids and
  *    IDENTICAL vectors. Every LSH/IVF cell grows N×, so bucketed
  *    candidate volume Σ|cell|² grows N² — the ANN hub regime — and
  *    cross-copy exact duplicates give dedup keys a known-answer
  *    output to scale against.
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> <outDir>
  *          [docs|events|embeddings] [xN] <key...>
  * (mode defaults to docs; optional `x<copies>` overrides the
  * default 10×). Only keys whose input is the probed table are
  * meaningful — the other fixture tables are not generated.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val (mode, rest) = args.drop(2) match {
      case a if a.nonEmpty && Set("docs", "events", "embeddings")(a.head) =>
        (a.head, a.tail)
      case a => ("docs", a)
    }
    val (copies, keys) = rest match {
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
    val withCopy = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
    mode match {
      case "docs" =>
        withCopy(spark.read.parquet(s"$sfDir/documents.parquet"))
          .select(
            (col("doc_id") + col("copy").cast("long") * lit(1000000L))
              .as("doc_id"),
            array_join(
              transform(split(col("text"), " "),
                x => concat_ws(" ", x, concat(lit("zz"), col("copy")))),
              " ").as("text"),
            col("lang"),
            col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      case "events" =>
        withCopy(graft.Tables.events(spark, sfDir))
          .select(
            (col("event_id") + col("copy").cast("long") * lit(1000000000L))
              .as("event_id"),
            col("ts"),
            when(col("user_id") % 97 === 0, col("user_id"))
              .otherwise(col("user_id") +
                         col("copy").cast("long") * lit(10000000L))
              .as("user_id"),
            col("event_type"), col("value"), col("props"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/events.parquet")
      case "embeddings" =>
        withCopy(spark.read.parquet(s"$sfDir/embeddings.parquet"))
          .select(
            (col("vec_id") + col("copy").cast("long") * lit(1000000L))
              .as("vec_id"),
            col("embedding"), col("label"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    println(f"PROBE gen-$mode${copies}x ${(System.nanoTime() - t0) / 1e9}%.2f s")

    keys.foreach { k =>
      val t = System.nanoTime()
      val n = graft.SparkEntry.queries(k)(spark, outDir).count()
      println(f"PROBE $k ${(System.nanoTime() - t) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
