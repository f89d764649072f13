package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.GraftFunctions

/** Product quantization (PQ) ANN: split each 64-dim vector into
  * [[NumSub]] = 8 subvectors of [[SubDim]] = 8 dims, learn a [[K]] = 16
  * centroid codebook PER SUBSPACE (8 independent small k-means fits), and
  * encode every vector as 8 centroid ids — 256 B of fp32 down to 8 code
  * bytes (4 bits each would pack to 4 B; the id array keeps the scan
  * readable). Queries run ADC (asymmetric distance computation): the query
  * precomputes one inner-product TABLE per subspace (table[m][k] =
  * q_m · c_mk, metadata-sized: 8×16 doubles) and the corpus scan scores a
  * vector as Σ_m table[m][code_m] — 8 table lookups + adds instead of 64
  * FMAs, on 32× less memory bandwidth. Top survivors pay an exact fp32
  * cosine re-rank (v8's shape: the re-rank fetches ~50 rows, never the
  * corpus).
  *
  * Scale: the fits train on a bounded sample above
  * [[IvfIndex.MaxTrainRows]] (FAISS trains PQ codebooks on a slice for the
  * same reason); encoding is one map-only pass with the codebook inlined
  * as literals (8×16×8 doubles — broadcast-by-constant-folding, no join);
  * the ADC scan is map-only + one TakeOrderedAndProject. Nothing
  * corpus-sized ever reaches the driver.
  *
  * Determinism: fixed seeds + fixed iteration count, argmin ties break on
  * the first (lowest) centroid id, ADC ties on vec_id — identical vectors
  * always share codes. k-means centroid VALUES have no cross-engine twin,
  * so (like v5) correctness lives in SketchSpec invariants, not a DuckDB
  * hash oracle.
  */
object PqIndex {

  val SubDim = 8
  val NumSub = 8
  val K = 16

  /** Per-subspace centroid matrices: `centers(m)(k)` is an 8-dim centroid. */
  final case class Codebook(centers: Array[Array[Array[Double]]])

  /** Fit one k-means per subspace on (a bounded sample of) the corpus. */
  def fit(emb: DataFrame, seed: Long = 42L,
          maxTrainRows: Long = IvfIndex.MaxTrainRows,
          kCentroids: Int = K): Codebook = {
    val n = emb.count()
    val train0 =
      if (n > maxTrainRows) {
        val s = emb.sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
        if (s.limit(kCentroids).count() < kCentroids) emb.limit(kCentroids * 10) else s
      } else emb
    val train = train0.cache()
    val centers = (0 until NumSub).map { m =>
      val feat = train.select(array_to_vector(
        expr(s"slice(embedding, ${m * SubDim + 1}, $SubDim)")).as("features"))
      // seed varies per subspace so identical subspace distributions don't
      // collapse to identical codebooks
      val model = new KMeans().setK(kCentroids).setSeed(seed + m).setMaxIter(5).fit(feat)
      model.clusterCenters.map(_.toArray)
    }.toArray
    train.unpersist()
    Codebook(centers)
  }

  private def matSql(cs: Array[Array[Double]]): String =
    cs.map(_.mkString("array(", ",", ")"))
      .mkString("CAST(array(", ",", ") AS ARRAY<ARRAY<DOUBLE>>)")

  /** Append a `codes` column: per subspace, the L2-nearest centroid id
    * (argmin; ties → lowest id via array_position-of-min). Map-only —
    * the codebook rides the plan as constant-folded literals.
    */
  def encode(df: DataFrame, cb: Codebook): DataFrame = {
    val codeCols = (0 until NumSub).map { m =>
      val lit = matSql(cb.centers(m))
      val dists = s"transform($lit, c -> aggregate(" +
        s"zip_with(slice(embedding, ${m * SubDim + 1}, $SubDim), c, " +
        "(x, cc) -> (CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)), " +
        "0D, (acc, v) -> acc + v))"
      expr(s"CAST(array_position($dists, array_min($dists)) - 1 AS INT)")
    }
    df.withColumn("codes", array(codeCols: _*))
  }

  /** ADC top-k for `queryId`'s vector: code-scan candidates (top
    * `rerank` by table-lookup inner product), exact fp32 cosine re-rank.
    */
  def search(spark: SparkSession, emb: DataFrame, queryId: Long, k: Int,
             rerank: Int = 50, seed: Long = 42L,
             kCentroids: Int = K): DataFrame = {
    GraftFunctions.register(spark)
    val cb = fit(emb, seed, kCentroids = kCentroids)
    val corpus = encode(emb.filter(col("vec_id") =!= queryId), cb)
    val q = emb.filter(col("vec_id") === queryId)
      .select("embedding").head.getSeq[Float](0).toArray.map(_.toDouble)
    val tables = cb.centers.zipWithIndex.map { case (cs, m) =>
      cs.map(c => c.zip(q.slice(m * SubDim, (m + 1) * SubDim))
        .map { case (a, b) => a * b }.sum)
    }
    val tablesLit = tables.map(_.mkString("array(", ",", ")"))
      .mkString("CAST(array(", ",", ") AS ARRAY<ARRAY<DOUBLE>>)")
    val cands = corpus
      .withColumn("adc", expr(
        s"aggregate(zip_with(codes, $tablesLit, (c, t) -> element_at(t, c + 1)), " +
          "0D, (acc, v) -> acc + v)"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rerank)
    val query = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
      .withColumn("q_norm", expr("sqrt(float_dot(q_emb, q_emb))"))
    cands.crossJoin(broadcast(query))
      .withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
      .withColumn("cosine",
        round(expr("float_dot(embedding, q_emb)") / (col("norm") * col("q_norm")), 6))
      .select("vec_id", "label", "cosine")
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
