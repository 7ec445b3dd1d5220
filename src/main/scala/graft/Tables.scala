package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `events` with `ts` converted to microsecond TimestampType.
    *
    * The fixture stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark 4.x rejects by default ([PARQUET_TYPE_ILLEGAL], SURVEY §1.4).
    * Recipe: read it as a raw long via the legacy conf, then
    * floor-divide ns→µs with integer `div` (NOT float division — ns
    * epoch values ≈1.7e18 exceed a double's 2^53 exact-integer range).
    * Integer floor matches DuckDB's native ns→µs truncation for these
    * positive-epoch values, so both engines see identical timestamps.
    *
    * The conf is session-scoped and read at scan time, so setting it
    * here (idempotently) covers harness-built sessions that lack it.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
