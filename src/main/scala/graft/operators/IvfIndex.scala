package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into `nClusters` k-means cells, then answer a query by probing only the
  * `nProbe` cells whose centroids are nearest the query — the classic
  * coarse-quantizer ANN layout (FAISS IVF-Flat shape), complementing the
  * LSH path (v4): IVF adapts to the data's density, LSH is oblivious but
  * index-free.
  *
  * Scale: the coarse quantizer trains on a bounded sample above
  * [[MaxTrainRows]], and (like [[PqIndex]]) Lloyd's runs on the DRIVER
  * over the collected sample — FAISS's shape, and the right trade:
  * sampling is the scale story, while a distributed loop pays a Catalyst
  * analyze/codegen cycle per iteration against microseconds of arithmetic
  * on the bounded sample. ASSIGNMENT covers every row and stays in Spark —
  * one map-only pass with the centroid matrix inlined as constant-folded
  * literals; at 100 TB you'd write the corpus bucketed/partitioned by
  * `cell` so a probe reads only its cells' files (partition pruning). Only
  * CENTROIDS (nClusters × dim doubles) and the single query vector ever
  * reach the driver — metadata-sized, never data.
  *
  * Determinism: fixed init (first nClusters distinct vectors in vec_id
  * order) + fixed iteration count, argmin ties to the lowest cell id;
  * identical vectors always share a cell, so recall at cosine 1.0 is
  * exactly 1.
  */
object IvfIndex {

  /** Above this row count the k-means fit trains on a ~[[MaxTrainRows]]-row
    * sample instead of the full corpus: coarse-quantizer centroids converge
    * on a sample (FAISS trains IVF on a slice for the same reason), while
    * k-means over 100 TB of vectors would be days per iteration.
    * ASSIGNMENT still covers every row — only training is sampled.
    */
  val MaxTrainRows = 100000L

  /** Fit the coarse quantizer and return (assigned corpus with `cell`,
    * centroid matrix).
    */
  def fit(emb: DataFrame, nClusters: Int, seed: Long = 42L,
          maxTrainRows: Long = MaxTrainRows, maxIter: Int = 5,
          knownCount: Option[Long] = None): (DataFrame, Array[Array[Double]]) = {
    // `knownCount` lets a caller that already counted the corpus (the
    // persisted-index build counts it for its training-size property)
    // skip the redundant count job — the fit is unchanged either way
    val n = knownCount.getOrElse(emb.count())
    val train0 =
      if (n > maxTrainRows) {
        val s = emb.sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
        // Bernoulli sampling can undershoot on small corpora; k-means needs
        // at least nClusters training rows — fall back deterministically.
        if (s.limit(nClusters).count() < nClusters) emb.limit(nClusters * 10)
        else s
      } else emb
    // bounded by construction — vec_id order keeps init deterministic
    val vecs: Array[Array[Double]] = train0.orderBy("vec_id").select("embedding")
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(vecs.nonEmpty, "IVF fit: empty training corpus")
    val dim = vecs(0).length
    val distinct = scala.collection.mutable.LinkedHashSet[Seq[Double]]()
    vecs.iterator.foreach(v => if (distinct.size < nClusters) distinct += v.toSeq)
    val base = distinct.toArray.map(_.toArray)
    val centers: Array[Array[Double]] =
      Array.tabulate(nClusters)(i => if (i < base.length) base(i) else base(0).clone)
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.ofDim[Double](nClusters, dim)
      val counts = new Array[Long](nClusters)
      var i = 0
      while (i < vecs.length) {
        val v = vecs(i)
        var best = 0; var bestD = Double.MaxValue
        var k = 0
        while (k < nClusters) {
          val c = centers(k); var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - c(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = k } // ties → lowest id
          k += 1
        }
        val s = sums(best); var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      var k = 0
      while (k < nClusters) { // empty cells keep their centroid
        if (counts(k) > 0) {
          val c = centers(k); val s = sums(k); var j = 0
          while (j < dim) { c(j) = s(j) / counts(k); j += 1 }
        }
        k += 1
      }
      iter += 1
    }
    (assign(emb, centers), centers)
  }

  /** Distributed cell assignment against a FIXED centroid matrix: L2
    * argmin with the centroids inlined as constant-folded literals, ties →
    * lowest cell id (array_position returns the FIRST minimum). Map-only;
    * shared by [[fit]] and the persisted index's no-refit batch encode
    * ([[PersistedAnnIndex.append]]) so assignment semantics cannot fork.
    */
  def assign(emb: DataFrame, centers: Array[Array[Double]]): DataFrame = {
    val lit = centers.map(_.mkString("array(", ",", ")"))
      .mkString("CAST(array(", ",", ") AS ARRAY<ARRAY<DOUBLE>>)")
    val dists = s"transform($lit, c -> aggregate(" +
      "zip_with(embedding, c, (x, cc) -> (CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)), " +
      "0D, (acc, v) -> acc + v))"
    emb.withColumn("cell",
      expr(s"CAST(array_position($dists, array_min($dists)) - 1 AS INT)"))
  }

  /** Exact-cosine top-k over the `nProbe` nearest cells to `queryId`'s
    * vector. Probe selection runs on the driver over the centroid matrix
    * (nClusters rows — metadata).
    */
  def topk(spark: SparkSession, emb: DataFrame, queryId: Long,
           nClusters: Int, nProbe: Int, k: Int): DataFrame = {
    val (assigned, centers) = fit(emb, nClusters)
    topkAssigned(spark, emb, assigned, centers, queryId, nProbe, k)
  }

  /** [[topk]] over an ALREADY-fitted model — lets callers that need the
    * centroid matrix (the v5 replay oracle) share one fit with the search.
    */
  def topkAssigned(spark: SparkSession, emb: DataFrame, assigned: DataFrame,
                   centers: Array[Array[Double]], queryId: Long,
                   nProbe: Int, k: Int): DataFrame = {
    GraftFunctions.register(spark)
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
