package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom whole-operator plan node (plans/TopKPerGroup.scala):
  * equivalence against the window formulation, physical plan shape
  * (partial exec → exchange → final exec), and edge cases.
  */
class TopKSpec extends AnyFunSuite {
  import TestSpark._

  private def li = Tables.lineitem(spark, sf)
    .select(col("l_returnflag"), col("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"))

  test("native top-k equals the window row_number formulation") {
    val native = plans.TopKPerGroup(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false),
          ("l_linenumber", false)), 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"),
               asc("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(native.count() === windowed.count())
    assert(native.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(native).count() === 0)
  }

  test("plan is partial exec -> exchange -> final exec, no sort of the input") {
    val native = plans.TopKPerGroup(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false),
          ("l_linenumber", false)), 5)
    // SparkPlan.nodeName strips the "Exec" suffix in tree rendering
    val plan = native.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).length === 2, s"plan:\n$plan")
    assert(plan.contains("Exchange"))
    assert(!plan.contains("Sort "), s"unexpected full sort in:\n$plan")
  }

  test("k larger than any group returns everything") {
    val native = plans.TopKPerGroup(li, Seq("l_returnflag"),
      Seq(("l_orderkey", false), ("l_linenumber", false)), Int.MaxValue)
    assert(native.count() === li.count())
  }

  test("k=1 picks the per-group minimum under ascending order") {
    val native = plans.TopKPerGroup(li, Seq("l_returnflag"),
      Seq(("l_orderkey", false), ("l_linenumber", false)), 1)
    val expected = li.groupBy("l_returnflag")
      .agg(min(struct(col("l_orderkey"), col("l_linenumber"))).as("m"))
      .select(col("l_returnflag"), col("m.l_orderkey"), col("m.l_linenumber"))
    val got = native.select("l_returnflag", "l_orderkey", "l_linenumber")
    assert(got.count() === 3)
    assert(got.exceptAll(expected).count() === 0)
  }

  test("property: random data, random k — native equals window (fixed seed)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 400)
      k <- Gen.choose(1, 7)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 4)
        v <- Gen.choose(-1000L, 1000L)
      } yield (g, v))
    } yield (k, rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) })
    var seed = Seed(42L)
    (1 to 8).foreach { _ =>
      val (k, rows) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      import TestSpark.spark.implicits._
      val df = rows.toDF("g", "v", "id")
      val native = plans.TopKPerGroup(df, Seq("g"),
        Seq(("v", true), ("id", false)), k)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(desc("v"), asc("id"))
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
      assert(native.count() === windowed.count(), s"k=$k n=${rows.size}")
      assert(native.exceptAll(windowed).count() === 0, s"k=$k diff")
    }
  }

  test("multi-column grouping works") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
    val native = plans.TopKPerGroup(ev, Seq("user_id", "event_type"),
      Seq(("ts", false), ("event_id", false)), 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(asc("ts"), asc("event_id"))
    val windowed = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(native.count() === windowed.count())
    assert(native.exceptAll(windowed).count() === 0)
  }
}
