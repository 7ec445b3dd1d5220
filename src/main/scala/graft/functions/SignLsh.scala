package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Pseudo-random-hyperplane sign-LSH bucket, shared by every sign-LSH
  * key (and mirrored in their DuckDB oracles via [[duckBucketSql]]).
  *
  * Plane `p`'s normal is a hash-derived ±1 vector over ALL embedding
  * dimensions: sgn(p,i) = ±1 from bit 16 of the LCG value
  * 1103515245·(p·1009 + i) + 12345 (glibc rand constants — a public,
  * engine-neutral bit mixer; all indices here are small positives, so
  * no negative-modulo divergence between engines). This replaces the
  * earlier axis-aligned form (sign of coordinate p), whose buckets
  * depended on coordinate order: on real, anisotropic embeddings the
  * first few coordinates are correlated and axis cells collapse; a
  * dense ±1 projection mixes every dimension into every plane, so the
  * cell distribution tracks the data's cluster structure, not its
  * storage layout (balanced-cells property on a coordinate-skewed
  * input asserted in Round12Spec).
  *
  * Cross-engine exactness: each coordinate is quantized to
  * floor(double(x)·1e6) BEFORE the dot product, so the projection is
  * pure BIGINT arithmetic — no float-summation-order hazard in the
  * sign, and the DuckDB oracle reproduces the bucket bit-for-bit
  * (float→double widening is exact; the one double multiply is the
  * same IEEE operation in both engines).
  *
  * The plane count is the scale knob (one more plane per corpus
  * doubling keeps Σ|cell|² flat — see the adaptive keys, which derive
  * it in-plan from count(*)), which is why `np` is an SQL expression:
  * a literal for the pinned keys, a column name for the adaptive ones.
  * The embedding column must be named `embedding` in scope.
  */
object SignLsh {

  /** Spark SQL fragment computing the bucket id (plane 0 is the MSB,
    * matching the previous axis-aligned convention). */
  def bucketExpr(np: String): String =
    s"""aggregate(sequence(0, ($np) - 1), 0L, (b, p) ->
          b * 2L + (CASE WHEN
            aggregate(sequence(1, size(embedding)), 0L, (acc, i) ->
              acc + (CASE WHEN ((1103515245L * (p * 1009 + i) + 12345L)
                                div 65536L) % 2L = 1L
                     THEN 1L ELSE -1L END)
                  * CAST(floor(CAST(element_at(embedding, i) AS DOUBLE)
                               * 1000000) AS BIGINT)) > 0L
            THEN 1L ELSE 0L END))"""

  /** The bucket as a Column; `np` is an SQL expression — a plane-count
    * literal ("5") or the name of an int column ("np"). */
  def bucketCol(np: String): Column = expr(bucketExpr(np))

  /** DuckDB mirror of [[bucketExpr]] — same BIGINT arithmetic, same
    * MSB-first plane order, verified bit-identical on the fixture. */
  def duckBucketSql(np: String): String =
    s"""CAST(list_sum(list_transform(range(0, ($np)), p ->
          CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
              i -> (CASE WHEN ((CAST(1103515245 AS BIGINT) * (p * 1009 + i)
                                + 12345) // 65536) % 2 = 1
                    THEN 1 ELSE -1 END)
                 * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                        AS BIGINT))) > 0
          THEN CAST(1 AS BIGINT) << (($np) - 1 - p)
          ELSE 0 END)) AS BIGINT)"""
}
