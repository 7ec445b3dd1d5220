package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 sixth batch — SURVEY.md §2.11k: TPC-H Q8/Q15 (closing out
  * the fixture-expressible TPC-H family at 13 of 22 — the other nine
  * need columns the fixture lacks: partsupp, commitdate/receiptdate,
  * shipmode, container, phone), the event-type transition matrix, and
  * the LSH recall audit that completes the measured-error story for
  * the dedup path. SURVEY §2.0 determinism rules apply throughout.
  */
object Pipelines9 {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // TPC-H Q8 shape (national market share): one conditional
    // aggregate computes the target nation's revenue and the total in
    // the same pass — never two scans; all five dimensions broadcast,
    // lineitem⋈orders is the only shuffle join (as Q7). The share
    // derives from the rounded decimal sums, deterministic by
    // construction.
    "tpch_q8_marketshare" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1995-01-01" &&
                col("l_shipdate") < "1997-01-01")
        .select("l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount", "l_shipdate")
      val custNat = broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_nationkey")
        .join(broadcast(Tables.nation(s, d)
                .select(col("n_nationkey").as("cn_key"),
                        col("n_regionkey"))),
              col("c_nationkey") === col("cn_key"))
        .join(broadcast(Tables.region(s, d)
                .filter(col("r_name") === "AMERICA")
                .select("r_regionkey")),
              col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey"))
      val supNat = broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey")
        .join(broadcast(Tables.nation(s, d)
                .select(col("n_nationkey").as("sn_key"),
                        col("n_name").as("supp_nation"))),
              col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(broadcast(Tables.part(s, d)
                .filter(col("p_type") === "PROMO").select("p_partkey")),
              col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
              col("l_orderkey") === col("o_orderkey"))
        .join(custNat, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(supNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(round(sum(when(col("supp_nation") === "NATION_7", vol)
                         .otherwise(0.0).cast("decimal(30,10)")), 2)
               .cast("double").as("nation_rev"),
             round(sum(vol.cast("decimal(30,10)")), 2).cast("double")
               .as("total_rev"))
        .select(col("o_year"), col("nation_rev"), col("total_rev"),
                (round(col("nation_rev") / col("total_rev"), 4) + 0.0)
                  .as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q15 shape (top supplier by quarterly revenue): the
    // per-supplier revenue aggregate, its maximum as a 1-row
    // broadcast, and an equality filter — ties all surface (the
    // classic view formulation), and equality compares the
    // identically-rounded doubles. The supplier dimension broadcasts
    // into the survivors only.
    "tpch_q15_topsupplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" &&
                col("l_shipdate") < "1996-04-01")
        .groupBy("l_suppkey")
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
                         .cast("decimal(30,10)")), 2).cast("double")
               .as("total_rev"))
      val mx = rev.agg(max("total_rev").as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
              col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy("s_suppkey")
    }),

    // Event-type transition matrix: consecutive-event pairs per user
    // (lag window, user-partitioned — uniform key) counted into the
    // 5×5 Markov matrix, with row-normalized probabilities from exact
    // integer counts. The matrix is type²-sized — constant — so the
    // normalizing window runs over 25 rows, never the fact.
    "events_path_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("tss"), asc("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
                date_trunc("second", col("ts")).as("tss"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n_trans"))
      trans
        .withColumn("row_total",
          sum("n_trans").over(Window.partitionBy("prev_type")))
        .select(col("prev_type"), col("event_type"), col("n_trans"),
                (round(col("n_trans") / col("row_total"), 4) + 0.0)
                  .as("p_trans"))
        .orderBy("prev_type", "event_type")
    }),

    // LSH recall audit: on the 1/20 probe subset, the banded MinHash
    // candidate set is measured against the EXACT J ≥ 0.5 pair set
    // (integer threshold form 3·|A∩B| ≥ |A|+|B| through the codegen'd
    // merge walk — no float in the join). Output per probe-lang:
    // ground-truth pairs, pairs the banding found, recall. Completes
    // the measured-error family: count-min and Bloom audit their
    // overcounts, the Jaccard audit measures estimator error, this
    // measures CANDIDATE-GENERATION recall — the one number that
    // justifies replacing the quadratic scan with banding at 100 TB
    // (audit on a sample, deploy on the corpus). The 4×4 banding's
    // theoretical miss rate (1−J⁴)⁴ is high near J=0.5 and <3% at the
    // fixture's typical J ≥ 0.88 — the audit REPORTS the realized
    // blend rather than assuming it.
    "llm_dedup_lsh_recall" -> ((s, d) => {
      graft.functions.SortedIntersectSize.register(s)
      val P = 2147483647L
      val A = Seq(100003L, 122251L, 135637L, 161423L, 173431L, 188677L,
                  199831L, 224737L, 350377L, 411637L, 467237L, 524287L,
                  600011L, 700001L, 800011L, 900001L)
      val B = Seq(7L, 977L, 1847L, 2741L, 3581L, 4421L, 5281L, 6143L,
                  7001L, 7919L, 8887L, 9733L, 10657L, 11677L, 12569L,
                  13457L)
      val hvExpr =
        "cast(conv(substring(md5(cast(tok as binary)),1,8),16,10) as bigint)"
      // Signature + band construction mirrors llm_dedup_minhash_lsh /
      // llm_minhash_jaccard_audit (same hash chain — the audit must
      // measure the PRODUCTION banding, not a lookalike).
      val sig = Tables.documents(s, d)
        .select(col("doc_id"),
                explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("hv", expr(hvExpr))
        .groupBy("doc_id")
        .agg(min((col("hv") * A(0) + B(0)) % P).as("m0"),
             (1 until 16).map(i =>
               min((col("hv") * A(i) + B(i)) % P).as(s"m$i")): _*)
        .localCheckpoint()
      // Raw-slice band keys (array<bigint>) so the recall measurement
      // is exactly the banding semantics the oracle states — the
      // production 8-byte xxhash64 key is a width optimization with a
      // documented collision bound (see llm_dedup_minhash_lsh), not
      // part of the semantics being audited.
      def banded(df: DataFrame): DataFrame = df.selectExpr(
        Seq("doc_id") ++ (0 until 4).map(i => s"array(" + Seq(
          "m0,m1,m2,m3", "m4,m5,m6,m7", "m8,m9,m10,m11",
          "m12,m13,m14,m15")(i) + s") as k$i") :+
          "stack(4, 0, array(m0,m1,m2,m3), 1, array(m4,m5,m6,m7), " +
          "2, array(m8,m9,m10,m11), 3, array(m12,m13,m14,m15)) " +
          "as (band_idx, band_key)": _*)
      val probeBands = banded(sig.filter(pmod(col("doc_id"), lit(20)) === 0))
      val allBands = banded(sig)
      val cand = probeBands.as("x").join(allBands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id") &&
          (col("x.band_idx") < 1 || col("x.k0") =!= col("y.k0")) &&
          (col("x.band_idx") < 2 || col("x.k1") =!= col("y.k1")) &&
          (col("x.band_idx") < 3 || col("x.k2") =!= col("y.k2")))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
                lit(1).as("hit"))
      val tsets = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          array_sort(array_distinct(
            transform(split(col("text"), " "), t => xxhash64(t)))).as("th"))
        .withColumn("n", size(col("th")))
        .localCheckpoint()
      // Ground truth via a LOSSLESS length-banded equi-join (round-6
      // advice: this was the repo's only unbucketed quadratic stage —
      // a broadcast nested loop over |probes|×|corpus|). The
      // threshold 3·|A∩B| ≥ |A|+|B| (J ≥ ½) forces n_b ∈ [⌈n_a/2⌉,
      // 2·n_a] because |A∩B| ≤ min(n_a, n_b); with g = floor(log2 n)
      // that pins floor(log2 n_b) ∈ {g−1, g, g+1} (n_b ≥ n_a/2 ≥
      // 2^(g−1); n_b ≤ 2·n_a < 2^(g+2)), so exploding the probe side
      // to g±1 and equi-joining on the bucket misses NOTHING — every
      // qualifying pair is length-compatible by construction. A salt
      // key (corpus row → pmod(doc_id, 8); probe row → all 8)
      // parallelizes within a bucket beyond the bucket count, so the
      // stage shuffles uniformly instead of pinning to one task per
      // band. Probe-side replication is ×24 on the 1/20 sample —
      // cheap; the corpus side maps each row to exactly one (band,
      // salt) key, so each pair meets exactly once (no dedup needed).
      val saltN = 8
      val probes = tsets.filter(pmod(col("doc_id"), lit(20)) === 0)
      val corpusB = tsets
        .withColumn("gb", floor(log2(col("n"))).cast("int"))
        .withColumn("salt", pmod(col("doc_id"), lit(saltN)).cast("int"))
      val probesB = probes
        .withColumn("g0", floor(log2(col("n"))).cast("int"))
        .withColumn("gb",
          explode(array(col("g0") - 1, col("g0"), col("g0") + 1)))
        .withColumn("salt",
          explode(array((0 until saltN).map(i => lit(i)): _*)))
      val exact = probesB.as("a").join(corpusB.as("b"),
          col("a.gb") === col("b.gb") &&
          col("a.salt") === col("b.salt") &&
          col("a.doc_id") < col("b.doc_id") &&
          expr("3 * graft_sorted_intersect_size(a.th, b.th) >= a.n + b.n"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
                col("a.lang").as("lang"))
      exact.join(cand, Seq("a_id", "b_id"), "left_outer")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_exact"),
             coalesce(sum("hit"), lit(0L)).as("n_found"))
        .select(col("lang"), col("n_exact"), col("n_found"),
                (round(col("n_found") / col("n_exact"), 4) + 0.0)
                  .as("recall"))
        .orderBy("lang")
    })
  )

  def oracles: Map[String, String] = Map(
    "tpch_q8_marketshare" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS o_year,
                CAST(round(sum(CAST(CASE WHEN n1.n_name = 'NATION_7'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                       AS DECIMAL(30,10))), 2) AS DOUBLE) AS nation_rev,
                CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_rev,
                round(CAST(round(sum(CAST(CASE WHEN n1.n_name = 'NATION_7'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                       AS DECIMAL(30,10))), 2) AS DOUBLE)
                      / CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(30,10))), 2) AS DOUBLE), 4) + 0.0
                  AS mkt_share
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
           AND o_custkey IN (
             SELECT c_custkey FROM customer
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             JOIN region ON n2.n_regionkey = r_regionkey
             WHERE r_name = 'AMERICA')
         GROUP BY o_year
         ORDER BY o_year""",

    "tpch_q15_topsupplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey
         )
         SELECT s_suppkey, s_name, total_rev
         FROM supplier JOIN rev ON s_suppkey = l_suppkey
         WHERE total_rev = (SELECT max(total_rev) FROM rev)
         ORDER BY s_suppkey""",

    "events_path_transitions" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
                  date_trunc('second', ts) AS tss
           FROM events
         ),
         t AS (
           SELECT lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY tss, event_id)
                    AS prev_type,
                  event_type
           FROM e
         ),
         m AS (
           SELECT prev_type, event_type, count(*) AS n_trans
           FROM t WHERE prev_type IS NOT NULL
           GROUP BY prev_type, event_type
         )
         SELECT prev_type, event_type, n_trans,
                round(n_trans / sum(n_trans)
                        OVER (PARTITION BY prev_type), 4) + 0.0 AS p_trans
         FROM m
         ORDER BY prev_type, event_type""",

    // Band-free oracle: candidates re-derived from the signature
    // table by band equality on the raw signature slices; exact side
    // is the semantic J >= 0.5 predicate in integer form.
    "llm_dedup_lsh_recall" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
                    AS tok
           FROM documents
         ),
         h AS (
           SELECT doc_id,
                  CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS hv
           FROM toks
         ),
         sig AS (
           SELECT doc_id,
                  min((hv * 100003 + 7) % 2147483647)     AS m0,
                  min((hv * 122251 + 977) % 2147483647)   AS m1,
                  min((hv * 135637 + 1847) % 2147483647)  AS m2,
                  min((hv * 161423 + 2741) % 2147483647)  AS m3,
                  min((hv * 173431 + 3581) % 2147483647)  AS m4,
                  min((hv * 188677 + 4421) % 2147483647)  AS m5,
                  min((hv * 199831 + 5281) % 2147483647)  AS m6,
                  min((hv * 224737 + 6143) % 2147483647)  AS m7,
                  min((hv * 350377 + 7001) % 2147483647)  AS m8,
                  min((hv * 411637 + 7919) % 2147483647)  AS m9,
                  min((hv * 467237 + 8887) % 2147483647)  AS m10,
                  min((hv * 524287 + 9733) % 2147483647)  AS m11,
                  min((hv * 600011 + 10657) % 2147483647) AS m12,
                  min((hv * 700001 + 11677) % 2147483647) AS m13,
                  min((hv * 800011 + 12569) % 2147483647) AS m14,
                  min((hv * 900001 + 13457) % 2147483647) AS m15
           FROM h GROUP BY doc_id
         ),
         cand AS (
           SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           FROM sig a JOIN sig b
             ON a.doc_id < b.doc_id
            AND ((a.m0 = b.m0 AND a.m1 = b.m1 AND
                  a.m2 = b.m2 AND a.m3 = b.m3) OR
                 (a.m4 = b.m4 AND a.m5 = b.m5 AND
                  a.m6 = b.m6 AND a.m7 = b.m7) OR
                 (a.m8 = b.m8 AND a.m9 = b.m9 AND
                  a.m10 = b.m10 AND a.m11 = b.m11) OR
                 (a.m12 = b.m12 AND a.m13 = b.m13 AND
                  a.m14 = b.m14 AND a.m15 = b.m15))
           WHERE a.doc_id % 20 = 0
         ),
         tsets AS (
           SELECT doc_id, lang, list_distinct(string_split(text, ' '))
                    AS toks
           FROM documents
         ),
         exact AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.lang AS lang
           FROM tsets a JOIN tsets b
             ON a.doc_id < b.doc_id
            AND 3 * len(list_intersect(a.toks, b.toks))
                >= len(a.toks) + len(b.toks)
           WHERE a.doc_id % 20 = 0
         )
         SELECT lang, count(*) AS n_exact,
                CAST(sum(CASE WHEN cand.a_id IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
                round(sum(CASE WHEN cand.a_id IS NOT NULL
                               THEN 1 ELSE 0 END) / count(*), 4) + 0.0
                  AS recall
         FROM exact LEFT JOIN cand USING (a_id, b_id)
         GROUP BY lang
         ORDER BY lang"""
  )
}
