package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 fourth batch: SQL pipe syntax, _metadata columns, printf
  * formatting, URL-normalize dedup, SCD2 intervals. */
class Round8dSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sql_pipe_syntax: pipe form lowers to the classic aggregate plan") {
    val got = q("sql_pipe_syntax").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_lines"),
                 r.getAs[Long]("rev_cents")))
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 30)
      .withColumn("rc", floor(col("l_extendedprice")
        * (lit(1.0) - col("l_discount")) * 100 + 0.5).cast("long"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("rc").as("rc"))
      .orderBy("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
                 r.getAs[Long]("rc")))
    assert(got.toSeq === expect.toSeq)
  }

  test("scan_metadata_cols: one file per partition, all files non-empty") {
    val rows = q("scan_metadata_cols").collect()
    val types = Tables.events(spark, sf)
      .select("event_type").distinct().collect().map(_.getString(0)).sorted
    assert(rows.map(_.getString(0)).toSeq === types.toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") === 1L,
        s"${r.getString(0)}: repartition-by-key must yield one file")
      assert(r.getAs[Boolean]("files_nonempty"))
    }
    assert(rows.map(_.getAs[Long]("n_rows")).sum ===
      Tables.events(spark, sf).count())
  }

  test("str_printf_format: fixed-width key is lossless and ordered") {
    val rows = q("str_printf_format").collect()
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[String]("min_key"), r.getAs[String]("max_key"))
      // lang:0000000-padded id:hex chars — zero padding makes the
      // lexical order equal the numeric doc_id order within a lang.
      assert(mn.matches("[a-z]{2}:\\d{7}:[0-9a-f]+"), mn)
      assert(mn <= mx)
      assert(mn.substring(0, 2) === r.getAs[String]("lang_prefix"))
    }
  }

  test("llm_url_normalize_dedup: canonical groups conserve documents") {
    val rows = q("llm_url_normalize_dedup").collect()
    val total = rows.map(r => r.getAs[Long]("n_dups") *
      r.getAs[Long]("n_groups")).sum
    assert(total === Tables.documents(spark, sf).count())
    // Tracking params stripped + fixed host: group count equals the
    // distinct doc_id % 97 values, independent of source/utm_campaign.
    val expectGroups = Tables.documents(spark, sf)
      .select((col("doc_id") % 97).as("m"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_groups")).sum === expectGroups)
    // Round-8 advice: the dedup semantics must actually fire — at
    // least one canonical group must hold more than one document.
    assert(rows.exists(_.getAs[Long]("n_dups") > 1L),
      "no canonical URL group has n_dups > 1 — dedup unexercised")
  }

  test("events_scd2_intervals: exactly one open interval per user, spans positive") {
    val rows = q("events_scd2_intervals").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_open") === 1L,
        s"user ${r.getLong(0)}: SCD2 history must end in one open interval")
      assert(r.getAs[Long]("n_intervals") >= 1L)
      assert(r.getAs[Long]("total_span_us") > 0L)
    }
    // One SINGLE sort/exchange pair feeds both window passes.
    val plan = q("events_scd2_intervals").queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(nExchanges <= 2, s"expected reused user_id exchange, got:\n$plan")
  }
}
