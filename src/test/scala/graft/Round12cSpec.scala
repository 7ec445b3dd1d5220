package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12c: the llm_dedup_simhash adaptive band width — the last
  * fixed-knob banded key gets the in-plan derivation
  * w = least(15, greatest(8, bits((N−1) div 20))) over a 60-bit
  * md5-prefix fingerprint. Contracts: the SQL derivation the
  * engine/oracle share agrees with the closed-form integer math at
  * every regime boundary; and at fixture scale (w = 8) the key is
  * bit-identical to the original 32-bit/byte-band form, proven
  * against an inline brute-force reference.
  */
class Round12cSpec extends AnyFunSuite {
  import TestSpark._

  test("band-width derivation matches closed form across regimes") {
    def scalaW(n: Long): Long =
      math.min(15L, math.max(8L,
        64L - java.lang.Long.numberOfLeadingZeros((n - 1) / 20)))
    // Boundaries: fixture sizes stay at 8 (output frozen), growth is
    // monotone, and the 60-bit budget caps at 15 from ~655 k docs.
    val cases = Seq(500L -> 8L, 5000L -> 8L, 5120L -> 8L, 5121L -> 9L,
      100000L -> 13L, 500000L -> 15L, 655360L -> 15L, 5000000L -> 15L)
    cases.foreach { case (n, expect) =>
      assert(scalaW(n) === expect, s"closed form at n=$n")
      val sqlW = spark.sql(
        s"""SELECT least(15, greatest(8,
              length(bin((cast($n as bigint) - 1) div 20)))) AS w""")
        .head().getInt(0).toLong
      assert(sqlW === expect, s"SQL derivation at n=$n")
    }
  }

  test("adaptive simhash at fixture scale equals the byte-band form") {
    // Inline reference: the ORIGINAL pinned chain — 32-bit md5-prefix
    // hash (= high 32 of the 60-bit hash), per-bit majority vote,
    // brute-force hamming <= 3 join. N = 500 docs at sf0.001, so the
    // quadratic reference is trivial; the declared key must produce
    // the identical pair set with identical hamming values.
    val sh32 = Tables.documents(spark, sf)
      .select(col("doc_id"),
              explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("hv", expr(
        "cast(conv(substring(md5(cast(tok as binary)),1,8),16,10) as bigint)"))
      .select(col("doc_id"), col("hv"),
              explode(expr("sequence(0, 31)")).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(when(expr("(hv >> bit) & 1") === 1, 1).otherwise(-1))
             .as("bal"))
      .groupBy("doc_id")
      .agg(sum(when(col("bal") > 0,
                    expr("shiftleft(cast(1 as bigint), bit)"))
             .otherwise(0L)).as("simhash"))
    val ref = sh32.as("a").join(sh32.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
        expr("bit_count(a.simhash ^ b.simhash) <= 3"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
              expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)")
                .as("hamming"))
    val got = SparkEntry.queries("llm_dedup_simhash")(spark, sf)
    assert(got.count() === ref.count(), "pair-set cardinality")
    assert(got.exceptAll(ref).count() === 0L &&
           ref.exceptAll(got).count() === 0L,
      "adaptive key diverges from the byte-band reference at w = 8")
  }
}
