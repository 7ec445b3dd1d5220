package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 pipeline operators: interval (range) join via time-bin
  * bucketing, deterministic stratified sampling, and near-duplicate
  * survivor election — the three operations that complete the
  * training-data-pipeline story around the dedup/similarity keys.
  *
  * 100 TB posture: every key here reduces to equi-joins or linear
  * scans on derived keys. The range join is the canonical pattern for
  * interval predicates at scale — bin the time axis so candidate
  * generation is an equi-join on (entity, bin) with work proportional
  * to bin occupancy, never to the quadratic pair space.
  */
object Pipelines2 {
  type Q = (SparkSession, String) => DataFrame

  /** Cross-engine-stable 32-bit hash of a string expression (md5 hex
    * prefix — same recipe as LlmScale.hvExpr). */
  private def hv32(sqlExpr: String): String =
    s"cast(conv(substring(md5(cast($sqlExpr as binary)),1,8),16,10) as bigint)"

  def queries: Map[String, Q] = Map(
    // Interval self-join: for every event, how many events by the same
    // user land in the following 5 minutes. The range predicate is
    // turned into an equi-join by binning the time axis at the window
    // width: a right event in (t, t+300s] lives in the left event's
    // bin or the next one, so the left side probes exactly two bins.
    // A naive theta-join on the raw inequality is a per-user cross
    // product; this plan's join is an equi-join on (user_id, bin)
    // whose output is bounded by bin occupancy.
    "join_range_bin" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
                unix_micros(col("ts")).as("us"))
        .withColumn("bin", (col("us") / 300000000L).cast("long"))
      val probes = ev.withColumn("pbin",
        explode(array(col("bin"), col("bin") + 1)))
      probes.as("a").join(ev.as("b"),
          col("a.user_id") === col("b.user_id") &&
          col("a.pbin") === col("b.bin") &&
          col("b.us") > col("a.us") &&
          col("b.us") <= col("a.us") + 300000000L,
          "left")
        .groupBy(col("a.event_id").as("event_id"))
        .agg(count(col("b.event_id")).as("n_follow"))
        .orderBy("event_id")
    }),

    // Deterministic stratified sample: EXACTLY floor(20%) of documents
    // per lang stratum, selected by hash-rank within the stratum (md5
    // prefix of doc_id, not Spark's sample() — rng streams don't
    // reproduce across engines or partitionings). The integer quota
    // test rk*5 <= n is exact in both engines, and hash-ordering makes
    // the sample stable under re-partitioning, retries, and engine
    // swaps — what a 100 TB pipeline needs for resumable sampling.
    // At scale the rank window is per-lang (the natural shuffle key);
    // a stratum too large for one window partition switches to the
    // two-pass form: per-stratum counts (broadcast) + hash-threshold
    // refinement, same output.
    "llm_sample_stratified" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("hv", "doc_id")
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      Tables.documents(s, d)
        .withColumn("hv", expr(hv32("cast(doc_id as string)")))
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
        .filter(col("rk") * 5 <= col("n"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // Near-duplicate survivor election (one union-find step): every
    // doc's cluster representative is the smallest doc_id among itself
    // and its direct near-dup neighbors (token Jaccard ≥ 0.5, lang
    // blocked — same edge set as llm_dedup_near). Docs whose rep is
    // themselves survive; the rest drop with a pointer to their rep.
    // At 100 TB full transitive closure runs this same min-propagation
    // to a fixpoint (3-5 rounds in practice); the declared key is the
    // deterministic first round.
    "llm_dedup_cluster" -> ((s, d) => {
      graft.functions.SortedIntersectSize.register(s)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                array_sort(array_distinct(
                  transform(split(col("text"), " "), t => xxhash64(t))))
                  .as("th"))
        .withColumn("n", size(col("th")))
        // Materialized once (N rows of hashed-token arrays): both
        // sides of the blocked edge join derive from this; lazily the
        // broadcast build re-runs the corpus tokenize+hash pipeline.
        .localCheckpoint()
      graft.plans.IntersectLengthPrune.enable(s)
      val para = s.conf.get("spark.sql.shuffle.partitions").toInt
      val edges = toks.repartition(para, col("doc_id")).as("a")
        .join(toks.as("b"),
          col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id") &&
          expr("graft_sorted_intersect_size(a.th, b.th)") * 3 >=
            col("a.n") + col("b.n"))
        .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      val minNb = edges.select(col("x").as("doc_id"), col("y").as("nb"))
        .unionByName(edges.select(col("y").as("doc_id"), col("x").as("nb")))
        .groupBy("doc_id").agg(min("nb").as("min_nb"))
      Tables.documents(s, d).select("doc_id")
        .join(minNb, Seq("doc_id"), "left")
        .select(col("doc_id"),
                least(col("doc_id"), coalesce(col("min_nb"), col("doc_id")))
                  .as("cluster_rep"))
        .withColumn("is_survivor", col("cluster_rep") === col("doc_id"))
        .orderBy("doc_id")
    }),

    // Full connected-components dedup clustering: transitive closure
    // of the near-dup edge set (token Jaccard ≥ 0.5, lang-blocked).
    // Round 3 ran min-label propagation + pointer jumping over the
    // FULL edge set every round; with |E| ≈ the lang-blocked pair
    // space on this corpus (98.7% of same-lang pairs qualify), the
    // per-round |E|-row joins + localCheckpoint materializations were
    // the whole cost (16 s driver — vs 1.7 s for llm_dedup_cluster,
    // which runs the SAME edge join once). This round: STAR
    // CONTRACTION. One min-over-neighbors round maps every vertex to
    // m(v) = min(v, neighbors) — m(v) is in v's component and the
    // per-component minimum is a fixpoint of m — then the graph
    // contracts to the distinct (m(x), m(y)) pairs with m(x) ≠ m(y),
    // which for near-dup blobs is ~zero to a handful of rows per
    // component chain. The pointer-jumping fixpoint loop then runs on
    // the CONTRACTED graph (tiny — its checkpoints and convergence
    // counts are metadata-sized), and the final label is one
    // broadcast-joinable lookup: comp(v) = comp'(m(v)). Exact for any
    // graph (chains converge in the loop); at 100 TB the full edge
    // set is touched exactly twice (min round + contraction) instead
    // of once per propagation round.
    "llm_dedup_cc" -> ((s, d) => {
      graft.functions.SortedIntersectSize.register(s)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                array_sort(array_distinct(
                  transform(split(col("text"), " "), t => xxhash64(t))))
                  .as("th"))
        .withColumn("n", size(col("th")))
        // Materialized once (N rows of hashed-token arrays): both
        // sides of the blocked edge join derive from this; lazily the
        // broadcast build re-runs the corpus tokenize+hash pipeline.
        .localCheckpoint()
      graft.plans.IntersectLengthPrune.enable(s)
      // Salted lang-blocked edge join (round 7): keyed on lang alone
      // the 3.2M within-lang merge walks land on |langs|=5 shuffle
      // tasks — 5 of 32 cores busy. The right side maps each doc to
      // one (lang, salt) via pmod(doc_id, s); the left side
      // replicates over all s salts (the token arrays are small
      // relative to the pair-walk CPU), so each qualifying a<b pair
      // still meets exactly once and the walk spreads over
      // |langs|×s tasks. s=4 fills the 32-core fixture box (measured
      // A/B: s=8 pays ~1s extra replication shuffle for no fixture
      // win); at cluster scale s scales with target parallelism /
      // |langs|. Length banding was measured useless here —
      // fixture doc lengths cluster in one octave (<1% pair
      // reduction), so parallelism, not pruning, is the lever; the
      // IntersectLengthPrune rule still short-circuits walks via the
      // min-size conjunct. Materialize the directed edge set ONCE
      // (2 longs per row), so the undirected view below doesn't
      // re-run the merge-walk join per consumer.
      val ccSalt = 4
      val e0 = toks
        .withColumn("salt",
          explode(array((0 until ccSalt).map(i => lit(i)): _*))).as("a")
        .join(toks.withColumn("salt",
                pmod(col("doc_id"), lit(ccSalt)).cast("int")).as("b"),
          col("a.lang") === col("b.lang") &&
          col("a.salt") === col("b.salt") &&
          col("a.doc_id") < col("b.doc_id") &&
          expr("graft_sorted_intersect_size(a.th, b.th)") * 3 >=
            col("a.n") + col("b.n"))
        .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
        .localCheckpoint()
      val und = e0.unionByName(
        e0.select(col("y").as("x"), col("x").as("y")))
      // Star round: m(v) = min(v, direct neighbors) — one uniform-key
      // agg over the edge set.
      val m = Tables.documents(s, d).select(col("doc_id"))
        .join(und.groupBy(col("x").as("doc_id")).agg(min("y").as("mn")),
              Seq("doc_id"), "left")
        .select(col("doc_id"),
                least(col("doc_id"), coalesce(col("mn"), col("doc_id")))
                  .as("m"))
        .localCheckpoint()
      // Contracted edge set: distinct star-representative pairs. The
      // star map is |V| rows of two longs — broadcast explicitly: the
      // checkpointed plan carries no stats, so the planner would
      // otherwise sort-merge the full |E| edge set against it twice.
      // At cluster scale the map is still broadcastable long after the
      // edge set is not (it shrinks with |V|, not |E|).
      val ce = und
        .join(broadcast(m.select(col("doc_id").as("x"), col("m").as("mx"))),
              Seq("x"))
        .join(broadcast(m.select(col("doc_id").as("y"), col("m").as("my"))),
              Seq("y"))
        .select(col("mx").as("x"), col("my").as("y"))
        .filter(col("x") =!= col("y"))
        .distinct()
        .localCheckpoint()
      // Pointer-jumping min-label fixpoint on the contracted graph.
      // Labels only decrease and label(u) ≤ u, so the jump
      // (label ← label(label)) compresses chains: O(log diameter)
      // rounds. The change flag carries through the checkpoint, so
      // convergence counts scan materialized partitions.
      var labels = ce.select(explode(array(col("x"), col("y"))).as("doc_id"))
        .distinct()
        .select(col("doc_id"), col("doc_id").as("label"))
        .localCheckpoint()
      var changed = 1L
      while (changed > 0) {
        val viaNb = ce.join(labels, ce("y") === labels("doc_id"))
          .groupBy(col("x").as("doc_id"))
          .agg(min("label").as("nb_label"))
        val prop = labels.join(viaNb, Seq("doc_id"), "left")
          .select(col("doc_id"),
                  least(col("label"), coalesce(col("nb_label"), col("label")))
                    .as("label"),
                  (col("nb_label").isNotNull &&
                   col("nb_label") < col("label")).as("chg"))
        val next = prop.as("a").join(
            prop.select(col("doc_id").as("label"), col("label").as("ll"))
              .as("b"),
            Seq("label"), "left")
          .select(col("doc_id"),
                  coalesce(col("ll"), col("label")).as("label"),
                  (col("chg") ||
                   (col("ll").isNotNull && col("ll") < col("label")))
                    .as("chg"))
          .localCheckpoint()
        changed = next.filter(col("chg")).count()
        labels = next.drop("chg")
      }
      // comp(v) = comp'(m(v)); vertices whose star never contracted
      // (label lookup misses) keep m(v) as their component. The label
      // table lives on the contracted graph (≤ one row per contracted
      // vertex) — broadcast for the same no-stats reason as above.
      m.join(broadcast(labels.select(col("label").as("component"),
                                     col("doc_id").as("m"))), Seq("m"), "left")
        .select(col("doc_id"),
                coalesce(col("component"), col("m")).as("component"))
        .withColumn("is_survivor", col("component") === col("doc_id"))
        .orderBy("doc_id")
    }),

    // Vocabulary building: corpus token frequencies with dense ids
    // assigned by (frequency desc, token asc) — the canonical
    // tokenizer-prep step. One explode + one uniform-key groupBy; the
    // ranking window is global but runs over |vocab| rows (tiny after
    // aggregation), not corpus rows — the standard shape at 100 TB.
    "llm_vocab_build" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("freq"), asc("token"))
      counts.withColumn("token_id",
          (row_number().over(w) - 1).cast("long"))
        .select(col("token_id"), col("token"), col("freq"))
        .orderBy("token_id")
    }),

    // Bigram language-model statistics: count(w1,w2), count(w1) and
    // the conditional probability P(w2|w1) as integer-exact parts
    // (floor(p·1e6) avoids cross-engine double-rounding divergence).
    // Linear explode → two uniform-key groupBys; at 100 TB the bigram
    // key space is the shuffle axis and is near-uniform by Zipf tail.
    "llm_ngram_lm" -> ((s, d) => {
      val bi = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(explode(expr(
          """transform(sequence(1, size(t) - 1),
               i -> struct(element_at(t, i) as w1,
                           element_at(t, i + 1) as w2))""")).as("b"))
        .select(col("b.w1"), col("b.w2"))
      val biCounts = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
      val uniCounts = bi.groupBy("w1").agg(count(lit(1)).as("n1"))
      biCounts.join(uniCounts, Seq("w1"))
        .select(col("w1"), col("w2"), col("n12"), col("n1"),
                floor(col("n12").cast("double") / col("n1") * 1e6)
                  .cast("long").as("p_x1e6"))
        .orderBy("w1", "w2")
    }),

    // Two-phase salted aggregation: the skew-agg pattern for hot
    // grouping keys. events has only 5 event_types, so a single
    // groupBy hashes 100k+ rows into 5 reducer keys; phase 1
    // aggregates on (key, salt-16) — 80 uniform sub-keys — and
    // phase 2 merges the 80 partials. Output identical to the plain
    // groupBy (sum/count/max are decomposable; avg derives from
    // sum/count at the end). Spark's partial aggregation already
    // map-side-combines, so this matters when the REDUCE side itself
    // is the bottleneck (few keys × heavy state at 100 TB).
    "agg_salted_twophase" -> ((s, d) => {
      // Sum a decimal cast, not raw doubles: the 16-partial two-phase
      // association would otherwise differ from the oracle's single
      // sum by ~1e-12, which round(,2) only masks until a sum lands
      // within float error of a .005 boundary. Decimal addition is
      // exact and order-independent, so partial/merge == single-pass.
      val partial = Tables.events(s, d)
        .withColumn("salt", pmod(col("user_id"), lit(16L)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("c"),
             sum(col("value").cast("decimal(30,10)")).as("sv"),
             max(col("value")).as("mx"))
      partial.groupBy("event_type")
        .agg(sum("c").as("n_events"),
             round(sum("sv"), 2).cast("double").as("sum_value"),
             round(max("mx"), 4).as("max_value"))
        .orderBy("event_type")
    }),

    // Sequence packing: assign documents to fixed token-budget packs
    // (4096 tokens) in doc_id order within each lang — the chunking
    // step before training-batch assembly. pack_id derives from the
    // EXCLUSIVE running token total, so a doc starts a new pack only
    // when the budget is already consumed; all integer arithmetic →
    // cross-engine exact. At scale the running sum is one window per
    // lang partition (linear, no shuffle beyond the partition).
    "llm_pack_sequences" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                     org.apache.spark.sql.expressions.Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum_excl",
          sum("n_tokens").over(w) - col("n_tokens"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
                (col("cum_excl") / 4096L).cast("long").as("pack_id"),
                col("cum_excl"))
        .orderBy("doc_id")
    }),

    // Multimodal frame sampling: video payloads (doc_id % 3 = 2, fake
    // decode per graft.multimodal.Multimodal) explode into per-frame
    // rows; every 5th frame is kept (the frame-sample step of a video
    // pipeline) and fingerprinted with integer arithmetic both engines
    // compute identically. The explode is the real Spark-side shape —
    // row counts scale with frames, partitioning follows the source.
    "llm_multimodal_frames" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 2)
        .select(col("doc_id"), (col("n_chars") % 120 + 1).as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
                explode(sequence(lit(0L), col("n_frames") - 1))
                  .as("frame_idx"))
        .filter(col("frame_idx") % 5 === 0)
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
                ((col("doc_id") * 1000003L + col("frame_idx") * 31L)
                   % 1000000007L).as("frame_fingerprint"))
        .orderBy("doc_id", "frame_idx")),

    // Streaming-shaped composite: top-3 JSON prop keys per tumbling
    // hour by event count (JSON extraction → windowed aggregate →
    // rank). The aggregation stage runs identically under readStream
    // emitting per-window updates; declared in batch form like the
    // other stream_* keys.
    "stream_topk_window" -> ((s, d) => {
      val agg = Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(window(col("ts"), "1 hour"), col("k"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("k"), col("n"))
      // asc_nulls_last, not asc: Spark defaults NULLS FIRST on ASC,
      // DuckDB NULLS LAST — a null-k group near the top-3 cut would
      // silently diverge (known NULLS-ordering parity trap).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("window_start").orderBy(desc("n"), asc_nulls_last("k"))
      agg.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("window_start", "rnk")
    })
  )

  def oracles: Map[String, String] = Map(
    "join_range_bin" ->
      """SELECT a.event_id AS event_id,
                count(b.event_id) AS n_follow
         FROM events a
         LEFT JOIN events b
           ON a.user_id = b.user_id
          AND epoch_us(CAST(b.ts AS TIMESTAMP)) >
                epoch_us(CAST(a.ts AS TIMESTAMP))
          AND epoch_us(CAST(b.ts AS TIMESTAMP)) <=
                epoch_us(CAST(a.ts AS TIMESTAMP)) + 300000000
         GROUP BY a.event_id
         ORDER BY event_id""",

    "llm_sample_stratified" ->
      """SELECT doc_id, lang, source
         FROM (SELECT doc_id, lang, source,
                      row_number() OVER (
                        PARTITION BY lang
                        ORDER BY CAST(('0x' || substring(
                            md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                          doc_id) AS rk,
                      count(*) OVER (PARTITION BY lang) AS n
               FROM documents)
         WHERE rk * 5 <= n
         ORDER BY doc_id""",

    "llm_dedup_cluster" ->
      """WITH toks AS (
           SELECT doc_id, lang, list_distinct(string_split(text, ' '))
                    AS toks
           FROM documents
         ),
         edges AS (
           SELECT a.doc_id AS x, b.doc_id AS y
           FROM toks a JOIN toks b
             ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.toks, b.toks))),
                       4) >= 0.5
         ),
         min_nb AS (
           SELECT doc_id, min(nb) AS min_nb
           FROM (SELECT x AS doc_id, y AS nb FROM edges
                 UNION ALL
                 SELECT y AS doc_id, x AS nb FROM edges)
           GROUP BY doc_id
         )
         SELECT d.doc_id,
                least(d.doc_id, coalesce(m.min_nb, d.doc_id))
                  AS cluster_rep,
                least(d.doc_id, coalesce(m.min_nb, d.doc_id)) = d.doc_id
                  AS is_survivor
         FROM documents d LEFT JOIN min_nb m ON d.doc_id = m.doc_id
         ORDER BY d.doc_id""",

    "llm_dedup_cc" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, lang, list_distinct(string_split(text, ' '))
                    AS toks
           FROM documents
         ),
         e0 AS (
           SELECT a.doc_id AS x, b.doc_id AS y
           FROM toks a JOIN toks b
             ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.toks, b.toks))),
                       4) >= 0.5
         ),
         edges AS (
           SELECT x, y FROM e0
           UNION ALL
           SELECT y AS x, x AS y FROM e0
         ),
         reach(src, dst) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT r.src, e.y FROM reach r JOIN edges e ON r.dst = e.x
         )
         SELECT src AS doc_id,
                min(dst) AS component,
                min(dst) = src AS is_survivor
         FROM reach
         GROUP BY src
         ORDER BY doc_id""",

    "llm_vocab_build" ->
      """WITH counts AS (
           SELECT unnest(string_split(text, ' ')) AS token
           FROM documents
         ),
         freq AS (
           SELECT token, count(*) AS freq FROM counts GROUP BY token
         )
         SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) - 1
                     AS BIGINT) AS token_id,
                token, freq
         FROM freq
         ORDER BY token_id""",

    "llm_ngram_lm" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         ),
         bi AS (
           SELECT unnest(list_transform(range(1, len(toks)),
                    i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS b
           FROM t
         ),
         pairs AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bi),
         bic AS (SELECT w1, w2, count(*) AS n12 FROM pairs GROUP BY w1, w2),
         unic AS (SELECT w1, count(*) AS n1 FROM pairs GROUP BY w1)
         SELECT bic.w1, bic.w2, n12, n1,
                CAST(floor(CAST(n12 AS DOUBLE) / n1 * 1e6) AS BIGINT)
                  AS p_x1e6
         FROM bic JOIN unic ON bic.w1 = unic.w1
         ORDER BY bic.w1, bic.w2""",

    "agg_salted_twophase" ->
      """SELECT event_type,
                count(*) AS n_events,
                CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE)
                  AS sum_value,
                round(max(value), 4) AS max_value
         FROM events
         GROUP BY event_type
         ORDER BY event_type""",

    "llm_pack_sequences" ->
      """WITH t AS (
           SELECT doc_id, lang,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents
         ),
         c AS (
           SELECT doc_id, lang, n_tokens,
                  sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - n_tokens
                    AS cum_excl
           FROM t
         )
         SELECT doc_id, lang, n_tokens,
                CAST(cum_excl // 4096 AS BIGINT) AS pack_id,
                CAST(cum_excl AS BIGINT) AS cum_excl
         FROM c
         ORDER BY doc_id""",

    "llm_multimodal_frames" ->
      """WITH vids AS (
           SELECT doc_id, n_chars % 120 + 1 AS n_frames
           FROM documents
           WHERE doc_id % 3 = 2
         ),
         frames AS (
           SELECT doc_id, n_frames,
                  unnest(range(0, n_frames)) AS frame_idx
           FROM vids
         )
         SELECT doc_id, n_frames, frame_idx,
                (doc_id * 1000003 + frame_idx * 31) % 1000000007
                  AS frame_fingerprint
         FROM frames
         WHERE frame_idx % 5 = 0
         ORDER BY doc_id, frame_idx""",

    "stream_topk_window" ->
      """WITH agg AS (
           SELECT date_trunc('hour', ts) AS window_start,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
                  count(*) AS n
           FROM events
           GROUP BY 1, 2
         )
         SELECT window_start, k, n,
                row_number() OVER (PARTITION BY window_start
                                   ORDER BY n DESC, k) AS rnk
         FROM agg
         QUALIFY rnk <= 3
         ORDER BY window_start, rnk"""
  )
}
