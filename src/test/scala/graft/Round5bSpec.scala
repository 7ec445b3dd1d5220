package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 second-batch invariants: sessionization partitions the
  * event stream with no intra-session gap over the threshold, the
  * salted join is value-identical to the plain join, int8
  * quantization is range-correct and hits ±127 at the max component,
  * substring-dedup pair counts are bounded by window counts, and the
  * Q13 distribution conserves customers.
  */
class Round5bSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("events_sessionize partitions all events; gaps within sessions <= 30min") {
    val sessions = q("events_sessionize")
    val total = sessions.agg(sum("n_events")).head.getLong(0)
    val nEvents = Tables.events(spark, sf).count()
    assert(total === nEvents, "sessions must partition the event set")
    // No session may span a >30min gap: rebuild per-event islands and
    // check max intra-session gap directly.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tss", "event_id")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
              date_trunc("second", col("ts")).as("tss"))
      .withColumn("gap",
        unix_timestamp(col("tss")) - unix_timestamp(lag("tss", 1).over(w)))
      .withColumn("brk",
        when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val badGaps = ev.filter(col("brk") === 0 && col("gap") > 1800).count()
    assert(badGaps === 0)
    // Session ids are dense ordinals from 1 per user.
    val maxVsCount = sessions.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(maxVsCount === 0, "session ids must be dense per-user ordinals")
  }

  test("join_skew_salted equals the unsalted join") {
    val salted = q("join_skew_salted")
    val plain = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf),
            col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 2).as("total_value"))
      .orderBy("c_mktsegment")
    assert(salted.collect().toSeq === plain.collect().toSeq)
  }

  test("llm_embed_quantize: q in [-127,127], max|q| = 127 per vector, all dims present") {
    val out = q("llm_embed_quantize")
    assert(out.filter(col("q") > 127 || col("q") < -127).count() === 0)
    val perVec = out.groupBy("vec_id")
      .agg(max(abs(col("q"))).as("mxq"), count(lit(1)).as("n"))
    assert(perVec.filter(col("mxq") =!= 127).count() === 0,
      "the max-magnitude component must quantize to exactly +-127")
    assert(perVec.filter(col("n") =!= 64).count() === 0,
      "every 64-dim vector explodes to 64 rows")
  }

  test("llm_dedup_substring: shared_windows bounded by either doc's window count") {
    val pairs = q("llm_dedup_substring")
    val winCount = Tables.documents(spark, sf)
      .select(col("doc_id"),
              (size(split(col("text"), " ")) - 15).as("nwin"))
      .filter(col("nwin") >= 1)
    val viol = pairs
      .join(winCount.withColumnRenamed("doc_id", "a_id")
                    .withColumnRenamed("nwin", "na"), Seq("a_id"))
      .join(winCount.withColumnRenamed("doc_id", "b_id")
                    .withColumnRenamed("nwin", "nb"), Seq("b_id"))
      .filter(col("shared_windows") > least(col("na"), col("nb")))
      .count()
    assert(viol === 0)
    // Exact duplicates (same text) must appear as a pair sharing every
    // window — if the fixture contains any.
    val dups = Tables.documents(spark, sf)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("a"), max("doc_id").as("b"), count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("a") =!= col("b"))
    val missing = dups.join(pairs,
        dups("a") === pairs("a_id") && dups("b") === pairs("b_id"),
        "left_anti").count()
    assert(missing === 0, "exact-duplicate docs must share windows")
  }

  test("tpch_q13_custdist conserves the customer set") {
    val dist = q("tpch_q13_custdist")
    val totalCust = dist.agg(sum("custdist")).head.getLong(0)
    assert(totalCust === Tables.customer(spark, sf).count())
  }

  test("llm_doc_entropy: 0 <= H <= ln(n_tokens); one row per doc") {
    val ent = q("llm_doc_entropy")
    assert(ent.count() === Tables.documents(spark, sf).count())
    // 1e-4 headroom: H = ln(n) exactly for all-distinct docs, and the
    // declared output rounds to 4 dp (up to +5e-5 over the bound).
    val viol = ent.filter(col("entropy") < 0 ||
      col("entropy") > log(col("n_tokens")) + 1e-4).count()
    assert(viol === 0)
  }

  test("llm_perplexity_lm: xent >= corpus-min nll and token counts match") {
    val x = q("llm_perplexity_lm")
    assert(x.count() === Tables.documents(spark, sf).count())
    // Per-doc token counts must equal the raw split length.
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    assert(x.join(raw, Seq("doc_id"))
      .filter(col("n_tokens") =!= col("n")).count() === 0)
    assert(x.filter(col("xent") <= 0).count() === 0,
      "cross-entropy vs a non-degenerate unigram LM is strictly positive")
  }
}
