package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-source counterpart of `Tables.events`: the same
  * ns-timestamp normalization (SURVEY §1.4) under `readStream`, so
  * batch operators and their streaming twins read identical schemas.
  *
  * The raw fixture stores `ts` as parquet INT64 TIMESTAMP(NANOS);
  * with `nanosAsLong` the scan yields LongType nanoseconds which are
  * floor-divided to microsecond timestamps — matching both the batch
  * loader and DuckDB's native truncation.
  */
object EventStream {
  /** Schema of the raw events parquet under nanosAsLong. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open `dir` (a directory of events-shaped parquet files) as a
    * stream with `ts` as microsecond TimestampType. */
  def open(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
