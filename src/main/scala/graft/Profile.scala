package graft
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for the expensive dedup keys: times each
  * materialization boundary of a pipeline separately so regressions
  * can be attributed to a stage instead of guessed at. Dev tool only —
  * not part of the declared query surface.
  */
object Profile {
  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PF $label ${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    val hvExpr = "cast(conv(substring(md5(cast(tok as binary)),1,8),16,10) as bigint)"
    val P = 2147483647L
    val A = Seq(100003L, 122251L, 135637L, 161423L, 173431L, 188677L,
                199831L, 224737L, 350377L, 411637L, 467237L, 524287L,
                600011L, 700001L, 800011L, 900001L)
    val B = Seq(7L, 977L, 1847L, 2741L, 3581L, 4421L, 5281L, 6143L,
                7001L, 7919L, 8887L, 9733L, 10657L, 11677L, 12569L,
                13457L)

    for (rep <- 1 to 2) {
      println(s"--- rep $rep: new llm_dedup_ngram stages ---")
      val sh = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), col("lang"),
                array_sort(array_distinct(expr(
                  """transform(
                       transform(sequence(1, size(t) - 2),
                         i -> concat_ws(' ', element_at(t, i),
                                        element_at(t, i + 1),
                                        element_at(t, i + 2))),
                       g -> xxhash64(g))"""))).as("sh"))
        .withColumn("n", size(col("sh")))
      time("ng.sh_agg")(sh.agg(sum("n")).count())
      val sig = Tables.documents(spark, sfDir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(t) - 2),
               i -> concat_ws(' ', element_at(t, i),
                              element_at(t, i + 1),
                              element_at(t, i + 2)))""")).as("tok"))
        .withColumn("hv", expr(hvExpr))
        .groupBy("doc_id")
        .agg(min((col("hv") * A(0) + B(0)) % P).as("m0"),
             (1 until 16).map(i =>
               min((col("hv") * A(i) + B(i)) % P).as(s"m$i")): _*)
      time("ng.sig")(sig.count())
      val sigK = sig.selectExpr("doc_id",
        "xxhash64(m0,  m1)  as k0", "xxhash64(m2,  m3)  as k1",
        "xxhash64(m4,  m5)  as k2", "xxhash64(m6,  m7)  as k3",
        "xxhash64(m8,  m9)  as k4", "xxhash64(m10, m11) as k5",
        "xxhash64(m12, m13) as k6", "xxhash64(m14, m15) as k7")
      val bands = sigK.selectExpr("doc_id",
        "k0", "k1", "k2", "k3", "k4", "k5", "k6", "k7",
        """stack(8, 0, k0, 1, k1, 2, k2, 3, k3,
                 4, k4, 5, k5, 6, k6, 7, k7) as (band_idx, band_key)""")
      time("ng.bands")(bands.count())
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id") &&
          (1 until 8).map(j =>
            col("x.band_idx") < j || col(s"x.k${j - 1}") =!= col(s"y.k${j - 1}"))
            .reduce(_ && _))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      time("ng.cand")(cand.count())
      graft.functions.SortedIntersectSize.register(spark)
      graft.plans.IntersectLengthPrune.enable(spark)
      val full = cand.join(sh.as("a"), col("a_id") === col("a.doc_id"))
        .join(sh.as("b"),
          col("b_id") === col("b.doc_id") &&
          col("a.lang") === col("b.lang") &&
          expr("graft_sorted_intersect_size(a.sh, b.sh)") * 13 >=
            (col("a.n") + col("b.n")) * 3)
      time("ng.full")(full.count())

      println(s"--- rep $rep: confirm-stage bisect ---")
      val joinNoWalk = cand.join(sh.as("a2"), col("a_id") === col("a2.doc_id"))
        .join(sh.as("b2"), col("b_id") === col("b2.doc_id") &&
              col("a2.lang") === col("b2.lang"))
      time("ng.join_nowalk")(joinNoWalk.count())
      val fullNoPrune = {
        val prev = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations = Seq.empty
        val df = cand.join(sh.as("a3"), col("a_id") === col("a3.doc_id"))
          .join(sh.as("b3"),
            col("b_id") === col("b3.doc_id") &&
            col("a3.lang") === col("b3.lang") &&
            expr("graft_sorted_intersect_size(a3.sh, b3.sh)") * 13 >=
              (col("a3.n") + col("b3.n")) * 3)
        val c = df.count()
        spark.experimental.extraOptimizations = prev
        c
      }
      time("ng.full_noprune")(fullNoPrune)
      println(s"--- rep $rep: checkpointed variant ---")
      val t0 = System.nanoTime()
      val sigC = sig.localCheckpoint()
      val shC = sh.localCheckpoint()
      println(f"PF ng.ckpt_build ${(System.nanoTime() - t0) / 1e9}%.3f rows=0")
      val sigKC = sigC.selectExpr("doc_id",
        "xxhash64(m0,  m1)  as k0", "xxhash64(m2,  m3)  as k1",
        "xxhash64(m4,  m5)  as k2", "xxhash64(m6,  m7)  as k3",
        "xxhash64(m8,  m9)  as k4", "xxhash64(m10, m11) as k5",
        "xxhash64(m12, m13) as k6", "xxhash64(m14, m15) as k7")
      val bandsC = sigKC.selectExpr("doc_id",
        "k0", "k1", "k2", "k3", "k4", "k5", "k6", "k7",
        """stack(8, 0, k0, 1, k1, 2, k2, 3, k3,
                 4, k4, 5, k5, 6, k6, 7, k7) as (band_idx, band_key)""")
      val candC = bandsC.as("x").join(bandsC.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id") &&
          (1 until 8).map(j =>
            col("x.band_idx") < j || col(s"x.k${j - 1}") =!= col(s"y.k${j - 1}"))
            .reduce(_ && _))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      val fullC = candC.join(shC.as("a"), col("a_id") === col("a.doc_id"))
        .join(shC.as("b"),
          col("b_id") === col("b.doc_id") &&
          col("a.lang") === col("b.lang") &&
          expr("graft_sorted_intersect_size(a.sh, b.sh)") * 13 >=
            (col("a.n") + col("b.n")) * 3)
      time("ng.full_ckpt")(fullC.count())
    }
    spark.stop()
  }
}
