package graft
import org.apache.spark.sql.SparkSession

/** Focused micro-bench: run one (or a comma-list of) declared key(s)
  * REPS times in a warm JVM, print per-rep seconds. For plan iteration
  * only — the graded protocol is graft.Bench (one rep per key, map
  * order, shared session), which this mirrors config-for-config.
  *
  * Usage: SPARK_GRAFT_KEY=llm_dedup_minhash_lsh SPARK_GRAFT_REPS=3 \
  *        sbt "runMain graft.BenchOne"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys = sys.env.getOrElse("SPARK_GRAFT_KEY", "llm_dedup_minhash_lsh")
      .split(",").toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    for (key <- keys; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(key)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"B1 $key rep$r $sec%.3f rows=$n")
    }
    spark.stop()
  }
}
