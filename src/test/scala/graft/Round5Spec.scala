package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 invariants: the simhash byte-banding is a lossless
  * candidate filter for hamming ≤ 3 (pigeonhole), the IVF assignment
  * is a partition (one cell per vector), chunking covers every token
  * with the declared overlap, and the new keys' first-collision joins
  * emit no duplicate pairs.
  */
class Round5Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("simhash byte-banding loses no pair at hamming <= 3 (pigeonhole, exhaustive)") {
    // Every <=3-bit flip pattern over several base fingerprints: the
    // flipped value must still agree with the base on >= 1 whole byte.
    val bases = Seq(0, -1, 0x5a5a5a5a, 0xa5a5a5a5, 0x12345678, 0x0f0f0f0f)
    for (x <- bases; i <- 0 until 32; j <- i until 32; k <- j until 32) {
      val y = x ^ (1 << i) ^ (if (j > i) 1 << j else 0) ^
        (if (k > j) 1 << k else 0)
      val bandAgree = (0 until 4).exists(b =>
        ((x >>> (8 * b)) & 255) == ((y >>> (8 * b)) & 255))
      assert(bandAgree,
        s"x=$x y=$y differ in <=3 bits but agree on no byte band")
    }
  }

  test("llm_dedup_simhash equals the unbanded hamming predicate and has no dup pairs") {
    val banded = q("llm_dedup_simhash")
    // Unbanded reference: recompute fingerprints via the declared
    // fingerprint key and apply the semantic predicate directly.
    val sh = SparkEntry.queries("llm_fingerprint_simhash")(spark, sf)
    val ref = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
        expr("bit_count(a.simhash ^ b.simhash) <= 3"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
              expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)")
                .as("hamming"))
    assert(banded.count() === ref.count())
    assert(banded.except(ref).count() === 0)
    assert(ref.except(banded).count() === 0)
    assert(banded.groupBy("a_id", "b_id").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("llm_sim_topk_ivf: assignment is a partition and top-k is within probed cells") {
    val out = q("llm_sim_topk_ivf").collect()
    assert(out.nonEmpty)
    // rnk is 1..3 per probe, neighbors distinct within a probe
    val byProbe = out.groupBy(_.getAs[Long]("probe_id"))
    byProbe.foreach { case (_, rows) =>
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted
      assert(rnks.zipWithIndex.forall { case (r, i) => r == i + 1 })
      val nbs = rows.map(_.getAs[Long]("neighbor_id"))
      assert(nbs.distinct.length == nbs.length)
    }
  }

  test("llm_chunk_overlap covers every token exactly with stride-24 windows") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val chunks = q("llm_chunk_overlap")
    // Per doc: first chunk starts at 1; last chunk ends at n; chunk i
    // starts at 24*i+1 <= previous end + 1 (overlap or adjacency).
    val j = chunks.groupBy("doc_id")
      .agg(max(col("chunk_idx") * 24 +
               col("n_chunk")).as("covered_end"),
           count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
    assert(j.filter(col("covered_end") =!= col("n")).count() === 0)
    // stride < window => consecutive chunks overlap whenever n > 32
    val multi = j.filter(col("n") > 32)
    assert(multi.filter(col("n_chunks") < 2).count() === 0)
  }

  test("llm_domain_mix weights are exact inverses of token share at ppm scale") {
    val rows = q("llm_domain_mix").collect()
    assert(rows.length > 1)
    val total = rows.map(_.getAs[Long]("tokens")).sum
    val n = rows.length
    rows.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      assert(r.getAs[Long]("share_ppm") === tokens * 1000000L / total)
      assert(r.getAs[Long]("weight_ppm") === total * 1000000L / (n * tokens))
    }
  }

  test("tpch_q18 returns only orders whose summed quantity exceeds 300") {
    val out = q("tpch_q18")
    assert(out.filter(col("sum_qty") <= 300).count() === 0)
    // survivor set equals the HAVING aggregate computed independently
    val big = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("s"))
      .filter(col("s") > 300).count()
    assert(out.count() === big)
  }
}
