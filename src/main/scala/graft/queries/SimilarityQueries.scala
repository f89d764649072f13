package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Registry.t

/** Similarity search over the `embeddings` table (FLOAT[64] vectors):
  * brute-force cosine top-k as the exact baseline, LSH-bucketed
  * (random-hyperplane) candidate generation as the scale path, and
  * embedding-cosine near-dup pairs.
  *
  * Dot products / norms are computed in DOUBLE via `aggregate(zip_with(...))`
  * — pure Catalyst higher-order functions, codegen-friendly, no UDF.
  * Scores are rounded to 6dp before ordering so Spark-vs-DuckDB last-ulp
  * summation differences cannot flip the compare; ties are broken by vec_id.
  */
object SimilarityQueries {

  /** Sequential left-fold dot product of two float arrays, in double. */
  def dotD(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")

  def normD(a: String): Column =
    expr(s"sqrt(aggregate($a, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")

  def cosine(a: String, b: String): Column = dotD(a, b) / (normD(a) * normD(b))

  val all: Map[String, GraftQuery] = Map(

    // Brute-force cosine top-k against the vec_id=0 query vector.
    "v1_cosine_topk" -> GraftQuery(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"))
        emb.crossJoin(broadcast(q))
          .withColumn("cosine", round(cosine("embedding", "q_emb"), 6))
          .filter(col("vec_id") =!= 0)
          .select("vec_id", "label", "cosine")
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      Some("""SELECT vec_id, label,
             |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             |         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6)
             |         AS cosine
             |FROM embeddings WHERE vec_id <> 0
             |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin),
      "exact ANN baseline: broadcast query vector, distributed scan + top-k"),

    // k-NN for a batch of query vectors (vec_id < 5): per-query top-3 via
    // window rank over the candidate cross product (broadcast queries).
    "v2_knn_batch" -> GraftQuery(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("vec_id"))
        emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", round(cosine("embedding", "q_emb"), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select("q_id", "vec_id", "cosine", "rnk")
      },
      Some("""SELECT q_id, vec_id, cosine, rnk FROM (
             |  SELECT q.vec_id AS q_id, e.vec_id,
             |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |                                      CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
             |         row_number() OVER (PARTITION BY q.vec_id
             |           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |                                                 CAST(q.embedding AS DOUBLE[])), 6) DESC,
             |                    e.vec_id) AS rnk
             |  FROM embeddings e, embeddings q
             |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
             |WHERE rnk <= 3""".stripMargin),
      "batched k-NN: one pass over the corpus for all queries"),

    // Embedding-cosine near-dup pairs: top-20 most-similar distinct pairs.
    // Exact all-pairs at test scale; the LSH variant below is the scale path.
    "v3_neardup_pairs" -> GraftQuery(
      (s, dir) => {
        val a = t(s, dir, "embeddings")
          .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
        val b = t(s, dir, "embeddings")
          .select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .withColumn("cosine", round(cosine("emb_a", "emb_b"), 6))
          .select("id_a", "id_b", "cosine")
          .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
          .limit(20)
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |ORDER BY cosine DESC, id_a, id_b LIMIT 20""".stripMargin),
      "embedding near-dup detection (exact baseline)"),

    // Scale path: random-hyperplane LSH — 16 sign bits from deterministic
    // pseudo-random ±1 hyperplanes (seeded by xxhash64 of (plane, dim)).
    // Same-bucket vectors become candidates; exact cosine re-ranks them.
    // xxhash64-derived planes have no DuckDB twin → rows-only + scalatest.
    "v4_lsh_buckets" -> GraftQuery(
      (s, dir) => {
        val planes = 16
        val emb = t(s, dir, "embeddings")
        // sign_p = sum_d emb[d] * (±1 from hash(p, d))  — computed with one
        // higher-order expression per plane; bucket = packed sign bits.
        val signCols = (0 until planes).map { p =>
          expr(
            s"""aggregate(zip_with(embedding, sequence(0, ${63}),
               |  (x, d) -> CAST(x AS DOUBLE) * (CAST(pmod(xxhash64($p, d), 2) * 2 - 1 AS DOUBLE))),
               |  0D, (acc, v) -> acc + v)""".stripMargin)
        }
        val bucket = (0 until planes).map { p =>
          when(signCols(p) > 0, lit(1L << p)).otherwise(0L)
        }.reduce((a, c) => a.bitwiseOR(c))
        val bucketed = emb.withColumn("bucket", bucket)
        val x = bucketed.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
        val y = bucketed.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket"))
        x.join(y, Seq("bucket")).filter(col("id_a") < col("id_b"))
          .withColumn("cosine", round(cosine("emb_a", "emb_b"), 6))
          .select("bucket", "id_a", "id_b", "cosine")
          .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
          .limit(50)
      },
      None,
      "random-hyperplane LSH bucketing + exact re-rank of candidates"),
  )
}
