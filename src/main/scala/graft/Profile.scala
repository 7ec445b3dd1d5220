package graft
import org.apache.spark.sql.SparkSession
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

    for (rep <- 1 to 2) {
      println(s"--- rep $rep: llm_dedup_cc stages ---")
      graft.functions.SortedIntersectSize.register(spark)
      graft.plans.IntersectLengthPrune.enable(spark)
      var t0 = System.nanoTime()
      val toks = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"),
                array_sort(array_distinct(
                  transform(split(col("text"), " "), t => xxhash64(t))))
                  .as("th"))
        .withColumn("n", size(col("th")))
        .localCheckpoint()
      println(f"PF cc.toks_ckpt ${(System.nanoTime() - t0) / 1e9}%.3f")
      val para = spark.conf.get("spark.sql.shuffle.partitions").toInt
      t0 = System.nanoTime()
      val e0 = toks.repartition(para, col("doc_id")).as("a")
        .join(toks.as("b"),
          col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id") &&
          expr("graft_sorted_intersect_size(a.th, b.th)") * 3 >=
            col("a.n") + col("b.n"))
        .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
        .localCheckpoint()
      println(f"PF cc.e0_ckpt ${(System.nanoTime() - t0) / 1e9}%.3f rows=${e0.count()}")
      val und = e0.unionByName(
        e0.select(col("y").as("x"), col("x").as("y")))
      t0 = System.nanoTime()
      val m = Tables.documents(spark, sfDir).select(col("doc_id"))
        .join(und.groupBy(col("x").as("doc_id")).agg(min("y").as("mn")),
              Seq("doc_id"), "left")
        .select(col("doc_id"),
                least(col("doc_id"), coalesce(col("mn"), col("doc_id")))
                  .as("m"))
        .localCheckpoint()
      println(f"PF cc.m_ckpt ${(System.nanoTime() - t0) / 1e9}%.3f rows=${m.count()}")
      t0 = System.nanoTime()
      val ce = und
        .join(broadcast(m.select(col("doc_id").as("x"), col("m").as("mx"))),
              Seq("x"))
        .join(broadcast(m.select(col("doc_id").as("y"), col("m").as("my"))),
              Seq("y"))
        .select(col("mx").as("x"), col("my").as("y"))
        .filter(col("x") =!= col("y"))
        .distinct()
        .localCheckpoint()
      println(f"PF cc.ce_ckpt ${(System.nanoTime() - t0) / 1e9}%.3f rows=${ce.count()}")
      t0 = System.nanoTime()
      var labels = ce.select(explode(array(col("x"), col("y"))).as("doc_id"))
        .distinct()
        .select(col("doc_id"), col("doc_id").as("label"))
        .localCheckpoint()
      var changed = 1L
      var rounds = 0
      while (changed > 0) {
        rounds += 1
        val viaNb = ce.join(labels, ce("y") === labels("doc_id"))
          .groupBy(col("x").as("doc_id"))
          .agg(min("label").as("nb_label"))
        val prop = labels.join(viaNb, Seq("doc_id"), "left")
          .select(col("doc_id"),
                  least(col("label"), coalesce(col("nb_label"), col("label")))
                    .as("label"),
                  (col("nb_label").isNotNull &&
                   col("nb_label") < col("label")).as("chg"))
        val next = prop.as("a").join(
            prop.select(col("doc_id").as("label"), col("label").as("ll"))
              .as("b"),
            Seq("label"), "left")
          .select(col("doc_id"),
                  coalesce(col("ll"), col("label")).as("label"),
                  (col("chg") ||
                   (col("ll").isNotNull && col("ll") < col("label")))
                    .as("chg"))
          .localCheckpoint()
        changed = next.filter(col("chg")).count()
        labels = next.drop("chg")
      }
      println(f"PF cc.loop ${(System.nanoTime() - t0) / 1e9}%.3f rounds=$rounds")
      t0 = System.nanoTime()
      val out = m.join(broadcast(labels.select(col("label").as("component"),
                                               col("doc_id").as("m"))),
                       Seq("m"), "left")
        .select(col("doc_id"),
                coalesce(col("component"), col("m")).as("component"))
        .withColumn("is_survivor", col("component") === col("doc_id"))
        .orderBy("doc_id")
      println(f"PF cc.final ${(System.nanoTime() - t0) / 1e9}%.3f rows=${out.count()}")
    }
    spark.stop()
  }
}
