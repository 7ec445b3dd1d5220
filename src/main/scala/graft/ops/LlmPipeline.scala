package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over `documents` and
  * `embeddings` (SURVEY.md §2.11): dedup, similarity search, text
  * stats, multimodal joins, language distribution.
  *
  * Scale posture (100 TB): everything here is a distributed
  * groupBy/join — no driver-side state. Exact dedup hashes then
  * aggregates (shuffle on hash — uniform by construction). Similarity
  * is blocked: probes × corpus with the probe side broadcast; the LSH
  * scale path lives in `graft.functions.MinHash` (Phase 4).
  */
object LlmPipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Sequential-sum dot product with elements promoted to double
    * before multiply — bit-matches the DuckDB oracle formulation. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, x) => acc + x)

  private def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0),
         (acc, x) => acc + x.cast("double") * x.cast("double")))

  def queries: Map[String, Q] = Map(
    "llm_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("text_hash"))
        .agg(min("doc_id").as("survivor_id"),
             count(lit(1)).as("group_size"))
        .orderBy("text_hash")),

    "llm_sim_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      // Probe side is tiny and broadcast: the corpus never shuffles.
      // Ranking uses the ROUNDED similarity + id tiebreak so the
      // ordering is identical across engines.
      val pairs = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
                round(dot(col("pe"), col("embedding")) /
                      (norm(col("pe")) * norm(col("embedding"))), 4)
                  .as("cos_sim"))
      val w = Window.partitionBy("probe_id")
        .orderBy(desc("cos_sim"), asc("neighbor_id"))
      pairs.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("probe_id", "rnk")
    }),

    "llm_text_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("n_distinct_tokens"),
          round(size(array_distinct(split(col("text"), " "))).cast("double") /
                size(split(col("text"), " ")).cast("double"), 4).as("ttr"),
          col("n_chars"))
        .orderBy("doc_id")),

    "llm_multimodal_join" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb  = Tables.embeddings(s, d)
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_docs"),
             round(avg(size(split(col("text"), " ")).cast("double")), 2)
               .as("avg_tokens"))
        .orderBy("label")
    }),

    "llm_lang_dist" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("lang")
      counts
        .withColumn("lang_share",
          round(col("n_docs") / sum("n_docs").over(w), 4))
        .orderBy("lang", "source")
    })
  )

  def oracles: Map[String, String] = Map(
    "llm_dedup_exact" ->
      """SELECT md5(text) AS text_hash,
                min(doc_id) AS survivor_id,
                count(*) AS group_size
         FROM documents
         GROUP BY 1
         ORDER BY text_hash""",

    "llm_sim_topk" ->
      """WITH norms AS (
           SELECT vec_id, embedding,
                  sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    AS nrm
           FROM embeddings
         ),
         pairs AS (
           SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
                  round(list_aggregate(
                          list_transform(list_zip(p.embedding, e.embedding),
                            z -> CAST(z[1] AS DOUBLE) *
                                 CAST(z[2] AS DOUBLE)), 'sum')
                        / (p.nrm * e.nrm), 4) AS cos_sim
           FROM norms p JOIN norms e ON e.vec_id <> p.vec_id
           WHERE p.vec_id < 10
         )
         SELECT probe_id, neighbor_id, cos_sim,
                row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, neighbor_id)
                  AS rnk
         FROM pairs
         QUALIFY rnk <= 3
         ORDER BY probe_id, rnk""",

    "llm_text_stats" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS n_tokens,
                len(list_distinct(string_split(text, ' ')))
                  AS n_distinct_tokens,
                round(CAST(len(list_distinct(string_split(text, ' ')))
                           AS DOUBLE)
                      / len(string_split(text, ' ')), 4) AS ttr,
                n_chars
         FROM documents
         ORDER BY doc_id""",

    "llm_multimodal_join" ->
      """SELECT label, count(*) AS n_docs,
                round(avg(CAST(len(string_split(text, ' ')) AS DOUBLE)), 2)
                  AS avg_tokens
         FROM documents JOIN embeddings ON doc_id = vec_id
         GROUP BY label
         ORDER BY label""",

    "llm_lang_dist" ->
      """SELECT lang, source, count(*) AS n_docs,
                round(count(*) * 1.0 /
                      sum(count(*)) OVER (PARTITION BY lang), 4)
                  AS lang_share
         FROM documents
         GROUP BY lang, source
         ORDER BY lang, source"""
  )
}
