package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md).
  *
  * Every table is a single parquet file under `$dir/<name>.parquet`.
  * At cluster scale these would be directories of many files /
  * partitions; nothing here assumes a single file — `spark.read
  * .parquet` takes files or directories alike, and all downstream
  * operators are declarative so Catalyst re-plans for whatever
  * partitioning the scan produces.
  */
object Tables {
  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` with `ts` normalized to microsecond TimestampType.
    *
    * The fixture's on-disk `ts` type has changed across driver
    * regenerations, so the loader adapts to whatever the scan reports
    * rather than pinning one encoding:
    *
    *  - INT64 TIMESTAMP(NANOS): Spark 4.x rejects it by default
    *    ([PARQUET_TYPE_ILLEGAL]); with `nanosAsLong` it surfaces as
    *    LongType. Floor-divide ns→µs with integer `div` (NOT float
    *    division — ns epoch values ≈1.7e18 exceed a double's 2^53
    *    exact-integer range). Integer floor matches DuckDB's native
    *    ns→µs truncation for positive-epoch values.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType:
    *    cast to TimestampType. The cast interprets the wall-clock in
    *    the session time zone and rendering inverts it with the same
    *    zone, so the wall-clock round-trips for any session TZ (all
    *    graft entry points additionally pin UTC), matching DuckDB's
    *    naive read of the same column.
    *  - TIMESTAMP(MICROS, adjusted) → TimestampType: passthrough.
    *
    * The `nanosAsLong` conf is session-scoped and read at scan time,
    * so setting it here (idempotently) covers harness-built sessions
    * that lack it; it is a no-op for non-nanos fixtures.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case _                => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
