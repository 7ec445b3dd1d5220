package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 fifth-batch invariants. The PageRank test is the
  * load-bearing one: the integer iteration must conserve the
  * accounting identity rank = base + damped in-flow exactly, and a
  * brute-force recomputation from the edge list must agree.
  */
class Round7eSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("graph_pagerank_knn equals a driver-side integer recomputation") {
    // Rebuild the same edge set brute-force: top-3 by (rounded cosine
    // desc, dst asc) within sign buckets.
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // Driver-side mirror of SignLsh: hash-derived ±1 planes over the
    // floor(x*1e6) quantization, MSB-first.
    def bucket(e: Array[Float]): Long = {
      var b = 0L
      for (p <- 0 until 5) {
        var acc = 0L
        var i = 1
        while (i <= e.length) {
          val sgn =
            if (((1103515245L * (p * 1000003 + i) + 12345L) / 65536L) % 2L == 1L)
              1L else -1L
          acc += sgn * math.floor(e(i - 1).toDouble * 1000000).toLong
          i += 1
        }
        b = b * 2 + (if (acc > 0) 1 else 0)
      }
      b
    }
    val byBucket = vecs.toSeq.groupBy { case (_, e) => bucket(e) }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      // Match Spark's round(x, 4): HALF_UP on the decimal expansion.
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val edges = byBucket.values.flatMap { members =>
      members.flatMap { case (src, se) =>
        members.filter(_._1 != src)
          .map { case (dst, de) => (src, dst, cos(se, de)) }
          .sortBy { case (_, dst, c) => (-c, dst) }
          .take(3).map { case (s0, d0, _) => (s0, d0) }
      }
    }.toSeq
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = vecs.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (s0, d0) =>
        in(d0) += pr(s0) / deg(s0)
      }
      pr = vecs.keys.map(v => v -> (150000L + 17 * in(v) / 20)).toMap
    }
    val got = q("graph_pagerank_knn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === pr)
    // Sanity: in-degree-0 nodes sit at the base rank.
    val dsts = edges.map(_._2).toSet
    vecs.keys.filterNot(dsts).foreach(v => assert(got(v) === 150000L))
  }

  test("llm_doc_containment: per-doc grain, symmetric-candidate consistency") {
    val rows = q("llm_doc_containment").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length === nDocs)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_supersets")
      val m = r.getAs[Long]("max_containment_pct")
      assert(n >= 0)
      assert(m >= -1 && m <= 100)
      // A doc with a >=80% superset must report max_pct >= 80.
      if (n > 0) assert(m >= 80)
      // -1 sentinel only when the doc had no candidate pair at all.
      if (m == -1) assert(n === 0)
    }
    // Containment >= Jaccard on the same pair: any doc the exact
    // near-dup key pairs (jaccard >= 0.5) must have a candidate here.
    val nearDup = SparkEntry.queries("llm_dedup_cluster")(spark, sf)
    if (nearDup.columns.contains("doc_id")) {
      val maxByDoc = rows.map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("max_containment_pct"))
        .toMap
      assert(maxByDoc.values.count(_ >= 50) > 0)
    }
  }

  test("llm_quality_gopher_rules gate counts are consistent") {
    val rows = q("llm_quality_gopher_rules").collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val fails = Seq("fail_wordcount", "fail_meanlen", "fail_stopword",
                      "fail_digit").map(r.getAs[Long](_))
      val pass = r.getAs[Long]("pass_all")
      fails.foreach(f => assert(f >= 0 && f <= n))
      assert(pass >= n - fails.sum, "inclusion-exclusion lower bound")
      assert(pass <= n - fails.max)
    }
  }

  test("llm_vocab_coverage is monotone and ends at the vocab head share") {
    val rows = q("llm_vocab_coverage").collect()
    assert(rows.length > 0 && rows.length <= 50)
    val ppm = rows.map(_.getAs[Long]("cum_ppm"))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => a <= b })
    assert(ppm.last <= 1000000L)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
           "head must be frequency-sorted")
    // If the whole vocab fits in 50 rows, coverage must hit 100%.
    val vocabSize = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .select("w").distinct().count()
    if (vocabSize <= 50) assert(ppm.last === 1000000L)
  }
}
