package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-source counterpart of `Tables.events`: the same
  * ts normalization (SURVEY §1.4) under `readStream`, so batch
  * operators and their streaming twins read identical schemas.
  *
  * `readStream` needs an explicit schema before any file arrives, but
  * the fixture's on-disk `ts` encoding has changed across driver
  * regenerations (INT64 TIMESTAMP(NANOS) → TIMESTAMP(MICROS,
  * isAdjustedToUTC=false)). So the opener probes the directory's
  * current footer with a one-off batch read (cheap: footers only, no
  * row groups) and adapts — exactly mirroring `Tables.events`:
  * LongType nanos are floor-divided to µs timestamps; TimestampNTZ is
  * cast to TimestampType (wall-clock round-trips in any session TZ);
  * TimestampType passes through. At cluster scale the source schema
  * is fixed by the pipeline contract and this probe happens once at
  * stream start, on the driver.
  */
object EventStream {
  /** Schema of the raw events parquet when `ts` is INT64 nanos under
    * nanosAsLong (legacy fixture encoding). */
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
    // An empty / not-yet-populated stream directory has no footer to
    // probe; fall back to the legacy fixed schema so the standard
    // open-before-first-file streaming pattern still works.
    val onDisk =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => rawSchema }
    val stream = spark.readStream.schema(onDisk).parquet(dir)
    onDisk("ts").dataType match {
      case LongType         => stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => stream.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => stream
      case _                => stream.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
