package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions — SURVEY.md §2.11f: IVF-style ANN beside the
  * sign-LSH path, SimHash-banded hamming dedup, training-chunk
  * generation, BPE pair statistics, and source-mixture rebalancing.
  * Determinism rules of §2.0 apply: rounded doubles with id tiebreaks,
  * integer-exact arithmetic wherever a threshold or weight is compared.
  */
object Pipelines4 {
  type Q = (SparkSession, String) => DataFrame

  private def cosine(s: SparkSession, a: String, b: String): Column = {
    graft.functions.CosineSimilarity.register(s)
    expr(s"graft_cosine_sim($a, $b)")
  }

  /** Corpus→cell argmax over the (vec_id, cent_id, cs) score relation
    * — shared by every IVF site (this key, the batch/persisted keys,
    * IvfProbe). The assignment is (max cs, tie-break min cent_id) per
    * vector; the OBVIOUS form, max over a (cs, −cent_id) STRUCT,
    * plans as SortAggregate — struct buffers aren't primitive-mutable,
    * so Spark cannot hash-aggregate them — and SortAggregate SORTS the
    * full N·k score relation per partition. Measured round 14: at 2 M
    * vecs × 4096 cells (8.2 × 10⁹ rows) the local sort spill exhausted
    * this box's ~75 GB of free disk TWICE — the build died where the
    * 400 k build (1.6 × 10⁹ rows) had quietly paid a sort nobody saw.
    * The fix packs the pair into ONE BIGINT: cs is exact at 4 decimals
    * (rounded in-plan), so cs_i = round(cs·10⁴) ∈ [−10⁴, 10⁴] takes 15
    * bits shifted left 48, and the low 48 bits carry 2⁴⁸−1−cent_id —
    * strictly increasing in cs, strictly decreasing in cent_id, so
    * max(pack) ≡ max(struct(cs, −cent_id)) bit-for-bit (Round14Spec
    * asserts the equivalence; all oracles untouched). max(BIGINT) is a
    * primitive-buffer HashAggregate inside whole-stage codegen: the
    * N·k rows reduce map-side to |V| groups in-stream, NOTHING sorts.
    * Contract (BOTH fields, ADVICE r14 — the helper is shared by four
    * call sites): `cs` must be a 4-decimal-ROUNDED value in [−1, 1]
    * (every caller passes `round(cosine, 4)`; an unrounded or
    * wider-range score overflows the 15-bit field into the cs bits and
    * silently corrupts the argmax), and cent_id ∈ [0, 2⁴⁸) —
    * ~2.8 × 10¹⁴ ids, comfortably above any corpus this engine
    * addresses. */
  private[graft] def cellArgmax(scores: DataFrame): DataFrame =
    scores.groupBy("vec_id")
      .agg(max(expr(
        """shiftleft(cast(round(cs * 10000) as bigint) + 10000, 48)
           + shiftleft(cast(1 as bigint), 48) - 1 - cent_id""")).as("pk"))
      .select(col("vec_id"),
              expr("""shiftleft(cast(1 as bigint), 48) - 1
                      - (pk & (shiftleft(cast(1 as bigint), 48) - 1))""")
                .as("cell"))

  def queries: Map[String, Q] = Map(
    // IVF (inverted-file) approximate nearest neighbor: a deterministic
    // coarse quantizer (every stride-th vector is a centroid)
    // partitions the corpus into cells; each probe searches only its
    // nprobe nearest cells. The cell assignment is ONE broadcast
    // pass over the corpus. The centroid stride is NOT pinned (round
    // 12 — a fixed stride of 50 makes k = N/50 centroids, so the
    // assignment pass is N·k = O(N²/50) cosines AND the centroid
    // table eventually outgrows broadcast): stride =
    // max(50, N div 4096) is derived from count(*) INSIDE the plan,
    // bounding k ≤ 4096 broadcastable centroids at any corpus size
    // while assignment work stays O(N·4096). At the check fixtures
    // N ≤ 2000 → stride = 50, preserving the declared fixture-scale
    // semantics. The corpus itself never shuffles by pair: candidates
    // are a cell-keyed equi-join, Σ_cell |probes_in_cell|·|cell| work,
    // the same volume argument as the sign-LSH path (llm_sim_topk_lsh)
    // but with data-adaptive cells instead of fixed hyperplanes.
    //
    // nprobe is ALSO derived in-plan (round 13 — a pinned nprobe=2
    // probed 2/4096 = 0.05% of the corpus at 100×, recall 0.367):
    // np = max(2, k div 16), i.e. a fixed ~6% cell fraction, so the
    // probed volume tracks the corpus instead of collapsing as k
    // grows. IvfProbe at the 400 k twinned corpus: np=256 (= the
    // dial's value at k=4096) gives strict top-3 id recall 0.768 at
    // 3.4 s per 1000-probe batch vs the exact broadcast scan's 46 s
    // for the same batch — the one-time 106 s assignment build
    // amortizes in ~2.5 such batches, which is the regime IVF is
    // for (build once per corpus version, query forever). At the
    // fixtures k ≤ 40 → np = 2, preserving declared output.
    "llm_sim_topk_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val sv = Tables.embeddings(s, d)
        .agg(count(lit(1)).as("n_vecs"))
        .select(greatest(lit(50L), expr("n_vecs div 4096")).as("stride"))
      val cents = e.crossJoin(broadcast(sv))
        .filter(col("vec_id") % col("stride") === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
      // Rounded similarity + centroid-id tiebreak: assignment must be
      // a total order so both engines pick identical cells. The scores
      // relation is SKINNY — (vec_id, cent_id, cs), no embedding
      // payload — and the corpus-side top-1 is a map-side-combining
      // primitive MAX via cellArgmax (packed (cs, cent_id) BIGINT —
      // see its comment for the round-14 SortAggregate finding), not
      // a row_number window: the N·k scored rows reduce to |V| groups
      // inside the scan stage, so nothing the size of N·k ever
      // shuffles OR sorts. (The round-11 form carried the 550-byte
      // embedding through an N·k-row window sort — measured OOM at
      // the 100× probe: 800 M rows ≈ 440 GB of sort input for what is
      // a per-key argmax. Round 12 fixed the shuffle with max(struct);
      // round 14 fixed the SORT max(struct) still paid.)
      val scores = e.join(broadcast(cents))
        .select(col("vec_id"), col("cent_id"),
                (round(cosine(s, "embedding", "ce"), 4) + 0.0).as("cs"))
      val cellsId = cellArgmax(scores)
      // Reattach the embedding with one uniform-key equi-join (at
      // cluster scale both sides shard on vec_id; no broadcast of an
      // N-row table).
      val cells = e.join(cellsId, Seq("vec_id"))
        .select(col("vec_id"), col("embedding"), col("cell"))
      // Probe side: 10 probes × k scores — the rank window runs over
      // a bounded relation, and the probe embeddings come from a
      // broadcast of 10 rows. np rides in as a one-row broadcast so
      // the whole dial stays inside the plan.
      val npTab = cents.agg(
        greatest(lit(2L), expr("count(1) div 16")).as("np"))
      val wAsg = Window.partitionBy("vec_id")
        .orderBy(desc("cs"), asc("cent_id"))
      val probeCells = scores.filter(col("vec_id") < 10)
        .withColumn("rn", row_number().over(wAsg))
        .crossJoin(broadcast(npTab))
        .filter(col("rn") <= col("np"))
        .join(broadcast(e.filter(col("vec_id") < 10)), Seq("vec_id"))
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
                col("cent_id").as("cell"))
      // Each vector lives in exactly one cell (rn=1), so a neighbor is
      // reachable through at most one of the probe's np cells — no
      // pair dedup needed.
      val cand = probeCells.join(cells, Seq("cell"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
                (round(cosine(s, "pe", "embedding"), 4) + 0.0).as("cos_sim"))
      val w = Window.partitionBy("probe_id")
        .orderBy(desc("cos_sim"), asc("neighbor_id"))
      cand.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("probe_id", "rnk")
    }),

    // SimHash near-dup pairs at hamming distance ≤ 3, banded: the
    // fingerprint splits into 4 w-bit bands, and any pair within
    // distance 3 agrees on ≥ 1 whole band (pigeonhole — 3 flipped
    // bits cannot touch 4 bands), so the band key is an EXACT
    // candidate filter, not a probabilistic one. First-collision emit
    // (band rows carry all four band keys; the ≠ guards emit a pair
    // only at its lowest agreeing band) replaces a pair-space
    // distinct, the same shape as llm_dedup_minhash_lsh.
    //
    // The band WIDTH is the scale knob, derived IN-PLAN (the
    // llm_sim_topk_lsh_adaptive pattern; the oracle recomputes it
    // from count(*)): w = least(15, greatest(8, bits((N−1) div 20)))
    // bits per band over the high 4w bits of a 60-bit md5-prefix
    // hash chain. A FIXED byte band is a measured scale-killer: its
    // 256-value keyspace lets UNRELATED docs collide at rate 1/256
    // per band, a Σ|bucket|² ≈ N²/256 chance-candidate term that the
    // round-12c planted probe clocked at 1 M docs (the true-pair
    // output is linear; the chance term is not). Growing w keeps
    // expected chance-bucket size ≤ ~20 docs (2^w ≥ N/20), linear
    // until the 60-bit budget caps w at 15 (~650 k docs; beyond, the
    // quadratic asymptote sits 128× further out than the byte form).
    // At fixture scale w = 8, making the fingerprint, bands, and
    // output byte-identical to the original 32-bit/byte-band form.
    "llm_dedup_simhash" -> ((s, d) => {
      val docs0 = Tables.documents(s, d)
      val wTab = docs0.agg(
        least(lit(15), greatest(lit(8),
            length(expr("bin((count(1) - 1) div 20)"))))
          .cast("int").as("w"))
      val hvExpr =
        "cast(conv(substring(md5(cast(tok as binary)),1,15),16,10) as bigint)"
      val sh = docs0
        .select(col("doc_id"),
                explode(array_distinct(split(col("text"), " "))).as("tok"))
        .crossJoin(broadcast(wTab))
        .withColumn("hv", expr(hvExpr))
        .select(col("doc_id"), col("w"), col("hv"),
                explode(expr("sequence(0, 4 * w - 1)")).as("bit"))
        .groupBy("doc_id", "w", "bit")
        .agg(sum(when(expr("(hv >> (60 - 4 * w + bit)) & 1") === 1, 1)
                   .otherwise(-1)).as("bal"))
        .groupBy("doc_id", "w")
        .agg(sum(when(col("bal") > 0,
                      expr("shiftleft(cast(1 as bigint), bit)"))
               .otherwise(0L)).as("simhash"))
        // Materialized once (N×3 longs): both self-join sides.
        .localCheckpoint()
      val keyed = sh.selectExpr("doc_id", "simhash",
        "(simhash >> (3 * w)) & (shiftleft(cast(1 as bigint), w) - 1) as b0",
        "(simhash >> (2 * w)) & (shiftleft(cast(1 as bigint), w) - 1) as b1",
        "(simhash >> w)       & (shiftleft(cast(1 as bigint), w) - 1) as b2",
        "simhash              & (shiftleft(cast(1 as bigint), w) - 1) as b3")
      val bands = keyed.selectExpr("doc_id", "simhash",
        "b0", "b1", "b2",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) as (band_idx, band_key)")
      bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id") &&
          (col("x.band_idx") < 1 || col("x.b0") =!= col("y.b0")) &&
          (col("x.band_idx") < 2 || col("x.b1") =!= col("y.b1")) &&
          (col("x.band_idx") < 3 || col("x.b2") =!= col("y.b2")) &&
          expr("bit_count(x.simhash ^ y.simhash) <= 3"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
                expr("cast(bit_count(x.simhash ^ y.simhash) as bigint)")
                  .as("hamming"))
        .orderBy("a_id", "b_id")
    }),

    // Sliding-window training chunks: 32-token windows, stride 24 —
    // the standard packing-prep step that turns documents into
    // overlapping model-context pieces. Row-local (explode over a
    // per-doc index sequence, no shuffle before the output sort);
    // chunk count is integer-exact in both engines:
    // 1 + (max(n-32,0)+23) div 24.
    "llm_chunk_overlap" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), col("t"),
                size(col("t")).cast("long").as("n"))
        .select(col("doc_id"), col("t"), col("n"),
                explode(expr(
                  "sequence(0L, (greatest(n - 32, 0L) + 23L) div 24)"))
                  .as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
                (least(col("chunk_idx") * 24 + 32, col("n")) -
                 col("chunk_idx") * 24).as("n_chunk"),
                element_at(col("t"),
                  (col("chunk_idx") * 24 + 1).cast("int")).as("first_tok"),
                element_at(col("t"),
                  least(col("chunk_idx") * 24 + 32, col("n")).cast("int"))
                  .as("last_tok"))
        .orderBy("doc_id", "chunk_idx")),

    // BPE merge-step statistics: frequency-weighted adjacent character
    // pair counts — the quantity byte-pair encoding maximizes at each
    // merge. Two-stage: token-TYPE frequencies first (corpus explode →
    // uniform-key agg), then char pairs over the distinct types only,
    // weighted by frequency — the standard trick that makes the char
    // stage O(|vocab|·len), independent of corpus size. The rank
    // window runs over |char-pair| rows (≤ alphabet², tiny — same
    // argument as llm_vocab_build).
    "llm_bpe_pair_stats" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .filter(length(col("tok")) >= 2)
      val pairs = tf
        .select(col("freq"), explode(expr(
          """transform(sequence(1, length(tok) - 1),
               i -> concat(substring(tok, i, 1), substring(tok, i + 1, 1)))"""))
          .as("pair"))
        .groupBy("pair").agg(sum("freq").as("weighted_count"))
      val w = Window.orderBy(desc("weighted_count"), asc("pair"))
      pairs.withColumn("rnk", row_number().over(w).cast("long"))
        .orderBy("rnk")
    }),

    // Source-mixture rebalancing: per-source token mass, its parts-per-
    // million share, and the integer sampling weight that would flatten
    // the mix to uniform-tokens-per-source — the knob a data-mixture
    // stage tunes. Integer-exact (ppm divisions on longs) so the
    // weights compare bit-identically across engines. One uniform-key
    // agg + one broadcast scalar join; nothing scales with corpus rows.
    "llm_domain_mix" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"),
                size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
      val tot = per.agg(sum("tokens").as("total_tokens"),
                        count(lit(1)).as("n_sources"))
      per.join(broadcast(tot))
        .select(col("source"), col("n_docs"), col("tokens"),
                expr("tokens * 1000000L div total_tokens").as("share_ppm"),
                expr("total_tokens * 1000000L div (n_sources * tokens)")
                  .as("weight_ppm"))
        .orderBy("source")
    })
  )

  /** DuckDB CTE chain of the full IVF rebuild over `corpus` (any
    * relation with (vec_id, embedding)), ending in `cand(probe_id,
    * neighbor_id, cos_sim)` — the un-ranked candidate set. Factored
    * (round 16) so the tombstone-delete key's oracle can state
    * "rebuild on the survivors" with the IDENTICAL text the in-plan
    * key is checked against — the two cannot drift apart. */
  private[graft] def duckIvfCandCtes(corpus: String): String =
    s"""sv AS (
           SELECT greatest(50, count(*) // 4096) AS stride FROM $corpus
         ),
         norms AS (
           SELECT vec_id, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    AS nrm
           FROM $corpus
         ),
         asg AS (
           SELECT e.vec_id, e.embedding, e.nrm, c.vec_id AS cent_id,
                  round(list_aggregate(
                          list_transform(list_zip(e.embedding, c.embedding),
                            z -> CAST(z[1] AS DOUBLE) *
                                 CAST(z[2] AS DOUBLE)), 'sum')
                        / (e.nrm * c.nrm), 4) + 0.0 AS cs
           FROM norms e CROSS JOIN norms c, sv
           WHERE c.vec_id % sv.stride = 0
         ),
         ranked_asg AS (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cs DESC, cent_id) AS rn
           FROM asg
         ),
         cells AS (
           SELECT vec_id, embedding, nrm, cent_id AS cell
           FROM ranked_asg WHERE rn = 1
         ),
         npv AS (
           SELECT greatest(2, count(*) // 16) AS np
           FROM $corpus, sv WHERE vec_id % sv.stride = 0
         ),
         probecells AS (
           SELECT vec_id AS probe_id, embedding AS pe, nrm AS pnrm,
                  cent_id AS cell
           FROM ranked_asg, npv WHERE vec_id < 10 AND rn <= npv.np
         ),
         cand AS (
           SELECT p.probe_id, n.vec_id AS neighbor_id,
                  round(list_aggregate(
                          list_transform(list_zip(p.pe, n.embedding),
                            z -> CAST(z[1] AS DOUBLE) *
                                 CAST(z[2] AS DOUBLE)), 'sum')
                        / (p.pnrm * n.nrm), 4) + 0.0 AS cos_sim
           FROM probecells p JOIN cells n USING (cell)
           WHERE n.vec_id <> p.probe_id
         )"""

  def oracles: Map[String, String] = Map(
    "llm_sim_topk_ivf" ->
      s"""WITH ${duckIvfCandCtes("embeddings")}
         SELECT probe_id, neighbor_id, cos_sim,
                row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id)
                  AS rnk
         FROM cand
         QUALIFY rnk <= 3
         ORDER BY probe_id, rnk""",

    // The oracle states the SEMANTIC predicate (hamming ≤ 3) with no
    // band condition: equality with the engine's banded plan proves
    // the 4-byte banding loses no qualifying pair.
    "llm_dedup_simhash" ->
      """WITH w AS (
           SELECT least(15, greatest(8,
                    length(bin((count(*) - 1) // 20)))) AS w
           FROM documents
         ),
         h AS (
           SELECT doc_id,
                  CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS hv
           FROM (SELECT doc_id,
                        unnest(list_distinct(string_split(text, ' ')))
                          AS tok
                 FROM documents)
         ),
         bal AS (
           SELECT doc_id, bit,
                  sum(CASE WHEN (hv >> (60 - 4 * w.w + bit)) & 1 = 1
                           THEN 1 ELSE -1 END) AS bal
           FROM h CROSS JOIN w
                CROSS JOIN (SELECT unnest(range(0, 60)) AS bit) bits
           WHERE bit < 4 * w.w
           GROUP BY doc_id, bit
         ),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN bal > 0
                                THEN (CAST(1 AS BIGINT) << bit)
                                ELSE 0 END) AS BIGINT) AS simhash
           FROM bal GROUP BY doc_id
         )
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                  AS hamming
         FROM sh a JOIN sh b
           ON a.doc_id < b.doc_id
          AND bit_count(xor(a.simhash, b.simhash)) <= 3
         ORDER BY a_id, b_id""",

    "llm_chunk_overlap" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS t,
                  len(string_split(text, ' ')) AS n
           FROM documents
         ),
         c AS (
           SELECT doc_id, t, n,
                  unnest(range(0, ((greatest(n - 32, 0) + 23) // 24) + 1))
                    AS chunk_idx
           FROM t
         )
         SELECT doc_id, chunk_idx,
                least(chunk_idx * 24 + 32, n) - chunk_idx * 24 AS n_chunk,
                t[chunk_idx * 24 + 1] AS first_tok,
                t[least(chunk_idx * 24 + 32, n)] AS last_tok
         FROM c
         ORDER BY doc_id, chunk_idx""",

    "llm_bpe_pair_stats" ->
      """WITH tf AS (
           SELECT tok, count(*) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents)
           GROUP BY tok
           HAVING len(tok) >= 2
         ),
         p AS (
           SELECT freq,
                  substring(tok, CAST(i AS INTEGER), 1) ||
                  substring(tok, CAST(i AS INTEGER) + 1, 1) AS pair
           FROM (SELECT tok, freq, unnest(range(1, len(tok))) AS i
                 FROM tf)
         ),
         agg AS (
           SELECT pair, CAST(sum(freq) AS BIGINT) AS weighted_count
           FROM p GROUP BY pair
         )
         SELECT pair, weighted_count,
                CAST(row_number() OVER (ORDER BY weighted_count DESC, pair)
                     AS BIGINT) AS rnk
         FROM agg
         ORDER BY rnk""",

    "llm_domain_mix" ->
      """WITH per AS (
           SELECT source, count(*) AS n_docs,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                    AS tokens
           FROM documents
           GROUP BY source
         ),
         tot AS (
           SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                  count(*) AS n_sources
           FROM per
         )
         SELECT source, n_docs, tokens,
                tokens * 1000000 // total_tokens AS share_ppm,
                total_tokens * 1000000 // (n_sources * tokens)
                  AS weight_ppm
         FROM per CROSS JOIN tot
         ORDER BY source"""
  )
}
