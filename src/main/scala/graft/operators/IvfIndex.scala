package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into `nClusters` k-means cells, then answer a query by probing only the
  * `nProbe` cells whose centroids are nearest the query — the classic
  * coarse-quantizer ANN layout (FAISS IVF-Flat shape), complementing the
  * LSH path (v4): IVF adapts to the data's density, LSH is oblivious but
  * index-free.
  *
  * Scale: the fit is one MLlib k-means — trained on a bounded sample above
  * [[MaxTrainRows]] (assignment still covers every row); assignments
  * persist as a `cell` column the query-side filters on — at 100 TB you'd
  * write the corpus bucketed/partitioned by cell so a probe reads only its
  * cells' files (partition pruning). Only CENTROIDS (nClusters × dim
  * doubles) and the single query vector ever reach the driver —
  * metadata-sized, never data.
  *
  * Determinism: fixed seed + fixed iteration count; identical vectors
  * always share a cell, so recall at cosine 1.0 is exactly 1.
  */
object IvfIndex {

  /** Above this row count the k-means fit trains on a ~[[MaxTrainRows]]-row
    * sample instead of the full corpus: coarse-quantizer centroids converge
    * on a sample (FAISS trains IVF on a slice for the same reason), while
    * MLlib k-means over 100 TB of vectors would be days per iteration.
    * ASSIGNMENT still covers every row — only training is sampled.
    */
  val MaxTrainRows = 100000L

  /** Fit the coarse quantizer and return (assigned corpus with `cell`,
    * centroid matrix).
    */
  def fit(emb: DataFrame, nClusters: Int, seed: Long = 42L,
          maxTrainRows: Long = MaxTrainRows): (DataFrame, Array[Array[Double]]) = {
    val feat = emb.withColumn("features", array_to_vector(col("embedding")))
    val n = feat.count()
    val train =
      if (n > maxTrainRows) {
        val s = feat.sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
        // Bernoulli sampling can undershoot on small corpora; k-means needs
        // at least nClusters training rows — fall back deterministically.
        if (s.limit(nClusters).count() < nClusters) feat.limit(nClusters * 10)
        else s
      } else feat
    val model = new KMeans().setK(nClusters).setSeed(seed).setMaxIter(5).fit(train)
    val assigned = model.transform(feat)
      .withColumn("cell", col("prediction")).drop("prediction", "features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Exact-cosine top-k over the `nProbe` nearest cells to `queryId`'s
    * vector. Probe selection runs on the driver over the centroid matrix
    * (nClusters rows — metadata).
    */
  def topk(spark: SparkSession, emb: DataFrame, queryId: Long,
           nClusters: Int, nProbe: Int, k: Int): DataFrame = {
    GraftFunctions.register(spark)
    val (assigned, centers) = fit(emb, nClusters)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb")).head.getSeq[Float](0).toArray.map(_.toDouble)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val probes = centers.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(q).map { case (a, b) => a * b }.sum
      val norm = math.sqrt(c.map(x => x * x).sum)
      (i, if (norm == 0) -1.0 else dot / (norm * qNorm))
    }.sortBy { case (i, cos) => (-cos, i) }.take(nProbe).map(_._1)

    val query = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
      .withColumn("q_norm", expr("sqrt(float_dot(q_emb, q_emb))"))
    assigned
      .filter(col("cell").isin(probes: _*))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(query))
      .withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
      .withColumn("cosine",
        round(expr("float_dot(embedding, q_emb)") / (col("norm") * col("q_norm")), 6))
      .select("vec_id", "label", "cosine")
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
