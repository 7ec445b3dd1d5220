package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the on-disk fixture schemas (FIXTURES.md, re-dumped
  * 2026-08-13) so a silent driver-side regeneration fails HERE, in
  * one obvious place, instead of as dozens of scattered analysis
  * errors across operator specs (the round-9 failure mode: `events
  * .ts` flipped from INT64 TIMESTAMP(NANOS) to TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) and 81 keys + 67 tests died on
  * `DATATYPE_MISMATCH`).
  *
  * Two layers are asserted:
  *  1. the RAW parquet read schema per table (what the driver wrote);
  *  2. the post-loader contract for `events` — `Tables.events` must
  *     yield a microsecond `TimestampType` `ts` whatever the on-disk
  *     encoding, because every downstream events operator assumes it.
  *
  * Nullability is ignored (pandas/pyarrow flip it freely between
  * regenerations; no operator depends on it).
  */
class FixturesSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark
  private val sf = TestSpark.sf

  /** name → type with nullability (incl. array-element) erased. */
  private def shape(st: StructType): Seq[(String, DataType)] = {
    def erase(dt: DataType): DataType = dt match {
      case ArrayType(e, _) => ArrayType(erase(e), containsNull = true)
      case s: StructType   => StructType(s.fields.map(f => f.copy(dataType = erase(f.dataType), nullable = true)))
      case other           => other
    }
    st.fields.toSeq.map(f => f.name -> erase(f.dataType))
  }

  private def assertSchema(table: String, expected: Seq[(String, DataType)]): Unit = {
    val got = shape(spark.read.parquet(s"$sf/$table.parquet").schema)
    assert(got == expected,
      s"\nFIXTURE DRIFT in $table.parquet — the driver regenerated the test data " +
      s"with a different schema.\n  expected: $expected\n  got:      $got\n" +
      "Update FIXTURES.md + this spec, and check Tables.scala loaders for type adaptivity.")
  }

  test("region schema pinned") {
    assertSchema("region", Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
  }

  test("nation schema pinned") {
    assertSchema("nation", Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
  }

  test("customer schema pinned") {
    assertSchema("customer", Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
  }

  test("supplier schema pinned") {
    assertSchema("supplier", Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
  }

  test("part schema pinned") {
    assertSchema("part", Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("orders schema pinned") {
    assertSchema("orders", Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType))
  }

  test("lineitem schema pinned") {
    assertSchema("lineitem", Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("events raw schema pinned (TIMESTAMP_NTZ micros since 2026-08-13)") {
    assertSchema("events", Seq(
      "event_id" -> LongType, "ts" -> TimestampNTZType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("documents schema pinned") {
    assertSchema("documents", Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
  }

  test("embeddings schema pinned") {
    assertSchema("embeddings", Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("Tables.events normalizes ts to TimestampType regardless of encoding") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events must yield TimestampType ts, got ${df.schema("ts").dataType}")
    // Sanity: values land in the documented 2024-01 window, so the
    // NTZ→TZ cast did not shift the wall-clock.
    val bounds = df.selectExpr("min(ts) as lo", "max(ts) as hi").collect()(0)
    assert(bounds.getTimestamp(0).toString.startsWith("2024-01"),
      s"events.ts min out of documented range: ${bounds.getTimestamp(0)}")
    assert(bounds.getTimestamp(1).toString.startsWith("2024-0"),
      s"events.ts max out of documented range: ${bounds.getTimestamp(1)}")
  }
}
