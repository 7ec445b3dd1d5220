package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { k =>
      val p = graft.SparkEntry.queries(k)(spark, args(0)).queryExecution.executedPlan.toString
      println(s"=== $k")
      p.linesIterator.filter(l => l.contains("Join")).foreach(l => println(l.trim.take(300)))
    }
    spark.stop()
  }
}
