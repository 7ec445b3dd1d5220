package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 second-batch invariants: k-means assignments partition the
  * vector set in both iterations, the PMI ranking is a true
  * TakeOrderedAndProject with monotone support, the hash split is
  * exhaustive and reproducible, and the clustered sink's read-back
  * filter reaches the parquet scan.
  */
class Round6bSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("llm_embed_kmeans: both assignments partition all vectors across k=10") {
    val km = q("llm_embed_kmeans").collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(km.length === 10)
    assert(km.map(_.getAs[Long]("n_init")).sum === n)
    assert(km.map(_.getAs[Long]("n_final")).sum === n)
    assert(km.map(_.getAs[Long]("c")).toSeq === (0L to 9L))
  }

  test("llm_token_bigram_pmi: monotone support, floor respected, limit plan") {
    val df = q("llm_token_bigram_pmi")
    val rows = df.collect()
    assert(rows.length <= 50)
    val sup = rows.map(_.getAs[Long]("c_xy"))
    assert(sup.forall(_ >= 5))
    assert(sup.zip(sup.tail).forall { case (x, y) => x >= y })
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "ranked limit must not become a global Sort + Limit")
  }

  test("llm_split_train_val: splits exhaustive, shares sum to 1") {
    val sp = q("llm_split_train_val").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(sp.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(math.abs(sp.map(_.getAs[Double]("doc_share")).sum - 1.0) < 0.01)
    assert(sp.map(_.getAs[String]("split")).sorted.toSeq ===
      Seq("test", "train", "val"))
  }

  test("sink_clustered_minmax: user-range predicate reaches the parquet scan") {
    val df = q("sink_clustered_minmax")
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("user_id"),
      s"user_id range filter missing from PushedFilters: $pushed")
    // Read-back equivalence against a direct computation.
    val direct = Tables.events(spark, sf)
      .filter(col("user_id") >= 1 && col("user_id") <= 8)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      assert(r.getAs[Long]("n_events") ===
        direct(r.getAs[String]("event_type")))
    }
  }
}
