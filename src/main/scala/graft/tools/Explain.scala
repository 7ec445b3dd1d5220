package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of selected
  * queries (or all) so pushdown / broadcast / codegen quality can be
  * audited. Usage: runMain graft.tools.Explain <sfDir> [key ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys = if (args.length > 1) args.drop(1).toSeq
               else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n===================== $k =====================")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
