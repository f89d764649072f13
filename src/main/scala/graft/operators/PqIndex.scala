package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Product quantization (PQ) ANN: split each 64-dim vector into
  * [[NumSub]] = 8 subvectors of [[SubDim]] = 8 dims, learn a [[K]] = 16
  * centroid codebook PER SUBSPACE, and encode every vector as 8 centroid
  * ids — 256 B of fp32 down to 8 code bytes (4 bits each would pack to
  * 4 B; the id array keeps the scan readable). Queries run ADC (asymmetric
  * distance computation): the query precomputes one inner-product TABLE per
  * subspace (table[m][k] = q_m · c_mk, metadata-sized: 8×16 doubles) and
  * the corpus scan scores a vector as Σ_m table[m][code_m] — 8 table
  * lookups + adds instead of 64 FMAs, on 32× less memory bandwidth. Top
  * survivors pay an exact fp32 cosine re-rank (v8's shape: the re-rank
  * fetches ~50 rows, never the corpus).
  *
  * The codebooks are fit by a JOINT Lloyd's loop, all 8 subspaces per
  * pass: one job assigns every training vector its 8 nearest-centroid ids
  * and re-averages all 128 centroids (posexplode over the 8 codes →
  * groupBy (subspace, code) → native `vec_avg`); the shuffle carries 128
  * aggregated groups, never rows. 8 separate ML k-means fits here cost
  * ~40 Spark jobs of per-job overhead for identical candidate quality —
  * codebooks only GATE candidates, survivors are re-scored in exact fp32,
  * so init/iteration polish buys nothing the re-rank doesn't already
  * guarantee. Init is the first K distinct subvectors in vec_id order
  * (deterministic, driver-side, bounded rows).
  *
  * Scale: the fit trains on a bounded sample above
  * [[IvfIndex.MaxTrainRows]] (FAISS trains PQ codebooks on a slice for the
  * same reason); encoding is one map-only pass with the codebook inlined
  * as literals (8×16×8 doubles — broadcast-by-constant-folding, no join);
  * the ADC scan is map-only + one TakeOrderedAndProject. Nothing
  * corpus-sized ever reaches the driver.
  *
  * Determinism: fixed init + fixed iteration count, argmin ties break on
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

  private def matSql(cs: Array[Array[Double]]): String =
    cs.map(_.mkString("array(", ",", ")"))
      .mkString("CAST(array(", ",", ") AS ARRAY<ARRAY<DOUBLE>>)")

  /** Subspace `m`'s nearest-centroid id (0-based) for the row's
    * `inputCol` vector: L2 argmin over the codebook literal; ties →
    * lowest id via array_position-of-min. Shared by the fit loop and
    * [[encode]] so assignment semantics cannot fork. `inputCol` may be a
    * float embedding or a double residual — CAST covers both.
    */
  private def subCode(m: Int, cs: Array[Array[Double]],
                      inputCol: String): Column = {
    val lit = matSql(cs)
    val dists = s"transform($lit, c -> aggregate(" +
      s"zip_with(slice($inputCol, ${m * SubDim + 1}, $SubDim), c, " +
      "(x, cc) -> (CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)), " +
      "0D, (acc, v) -> acc + v))"
    expr(s"CAST(array_position($dists, array_min($dists)) - 1 AS INT)")
  }

  /** The RESIDUAL of each row's embedding vs its assigned cell's centroid
    * — FAISS's IVF-PQ default: the codebook quantizes `x − μ_cell`, whose
    * spread within a cell is far tighter than the raw corpus's, so the
    * same 8 code bytes carry materially more ADC precision. Map-only; the
    * centroid matrix rides the plan as a constant-folded literal and
    * `cell` picks the row's centroid.
    */
  def residualCol(centers: Array[Array[Double]]): Column = {
    val lit = centers.map(_.mkString("array(", ",", ")"))
      .mkString("CAST(array(", ",", ") AS ARRAY<ARRAY<DOUBLE>>)")
    expr(s"zip_with(embedding, element_at($lit, cell + 1), " +
      "(x, c) -> CAST(x AS DOUBLE) - c)")
  }

  /** Fit all [[NumSub]] subspace codebooks on (a bounded sample of) the
    * corpus. The sample is collected ONCE and Lloyd's runs on the driver —
    * the same shape as FAISS's PQ training, and the right trade here: the
    * training set is ≤ [[IvfIndex.MaxTrainRows]] rows BY CONSTRUCTION
    * (sampling is the scale story, not distribution), while a distributed
    * Lloyd loop pays a full Catalyst analyze/codegen cycle of a
    * 128-literal-centroid expression per iteration — measured at ~1.5 s
    * per iteration of pure plan compilation against microseconds of
    * actual arithmetic on the bounded sample. Only encode + the ADC scan
    * touch the full corpus, and those stay in Spark.
    */
  def fit(emb: DataFrame, seed: Long = 42L,
          maxTrainRows: Long = IvfIndex.MaxTrainRows,
          kCentroids: Int = K, maxIter: Int = 5): Codebook = {
    val n = emb.count()
    val train0 =
      if (n > maxTrainRows) {
        val s = emb.sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
        if (s.limit(kCentroids).count() < kCentroids) emb.limit(kCentroids * 10) else s
      } else emb
    // bounded by construction (≤ ~maxTrainRows × 64 floats) — vec_id order
    // keeps init and iteration order deterministic across runs
    val vecs: Array[Array[Double]] = train0.orderBy("vec_id").select("embedding")
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    lloyd(vecs, kCentroids, maxIter)
  }

  /** [[fit]] over RESIDUALS: the training sample is collected WITH its
    * cell assignment and each vector's centroid is subtracted before the
    * Lloyd loop — the codebook learns the within-cell error distribution
    * (FAISS IVF-PQ's default encoding). Same sampling, init, and
    * determinism contract as [[fit]].
    */
  def fitResidual(assigned: DataFrame, centers: Array[Array[Double]],
                  seed: Long = 42L,
                  maxTrainRows: Long = IvfIndex.MaxTrainRows,
                  kCentroids: Int = K, maxIter: Int = 5,
                  knownCount: Option[Long] = None): Codebook = {
    // assignment is map-only over the corpus, so |assigned| == |corpus| —
    // a caller that already counted the corpus passes it through and the
    // redundant count job (a full re-run of the assignment expression at
    // 100 TB) disappears; the fit is unchanged either way
    val n = knownCount.getOrElse(assigned.count())
    val train0 =
      if (n > maxTrainRows) {
        val s = assigned.sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
        if (s.limit(kCentroids).count() < kCentroids) assigned.limit(kCentroids * 10)
        else s
      } else assigned
    val vecs: Array[Array[Double]] = train0.orderBy("vec_id")
      .select("cell", "embedding").collect().map { r =>
        val mu = centers(r.getInt(0))
        r.getSeq[Float](1).toArray.zip(mu).map { case (x, c) => x.toDouble - c }
      }
    lloyd(vecs, kCentroids, maxIter)
  }

  /** The shared driver-side joint Lloyd loop over a bounded sample (raw
    * subvectors for [[fit]], residual subvectors for [[fitResidual]]).
    */
  private def lloyd(vecs: Array[Array[Double]], kCentroids: Int,
                    maxIter: Int): Codebook = {
    require(vecs.nonEmpty, "PQ fit: empty training corpus")
    val centers: Array[Array[Array[Double]]] = Array.tabulate(NumSub) { m =>
      // init: first kCentroids DISTINCT subvectors. Padding with the first
      // when the corpus has fewer is harmless — a duplicate centroid never
      // wins an argmin tie (lowest id wins).
      val distinct = scala.collection.mutable.LinkedHashSet[Seq[Double]]()
      vecs.iterator.map(v => v.slice(m * SubDim, m * SubDim + SubDim).toSeq)
        .foreach(sv => if (distinct.size < kCentroids) distinct += sv)
      val base = distinct.toArray.map(_.toArray)
      Array.tabulate(kCentroids)(i => if (i < base.length) base(i) else base(0).clone)
    }
    var iter = 0
    while (iter < maxIter) {
      var m = 0
      while (m < NumSub) {
        val cs = centers(m)
        val sums = Array.ofDim[Double](kCentroids, SubDim)
        val counts = new Array[Long](kCentroids)
        var i = 0
        while (i < vecs.length) {
          val v = vecs(i)
          val off = m * SubDim
          // L2 argmin, ties → lowest centroid id (strict <)
          var best = 0; var bestD = Double.MaxValue
          var k = 0
          while (k < kCentroids) {
            val c = cs(k); var d = 0.0; var j = 0
            while (j < SubDim) { val t = v(off + j) - c(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = k }
            k += 1
          }
          val s = sums(best); var j = 0
          while (j < SubDim) { s(j) += v(off + j); j += 1 }
          counts(best) += 1
          i += 1
        }
        var k = 0
        while (k < kCentroids) { // empty clusters keep their centroid
          if (counts(k) > 0) {
            val c = cs(k); val s = sums(k); var j = 0
            while (j < SubDim) { c(j) = s(j) / counts(k); j += 1 }
          }
          k += 1
        }
        m += 1
      }
      iter += 1
    }
    Codebook(centers)
  }

  /** Append a `codes` column: per subspace, the L2-nearest centroid id of
    * the row's `inputCol` vector (raw embedding, or a residual built by
    * [[residualCol]]). Map-only — the codebook rides the plan as
    * constant-folded literals.
    */
  def encode(df: DataFrame, cb: Codebook,
             inputCol: String = "embedding"): DataFrame =
    df.withColumn("codes",
      array((0 until NumSub).map(m => subCode(m, cb.centers(m), inputCol)): _*))

  private def queryVec(emb: DataFrame, queryId: Long): Array[Double] =
    emb.filter(col("vec_id") === queryId)
      .select("embedding").head.getSeq[Float](0).toArray.map(_.toDouble)

  /** ADC candidate scan (top `rerank` by table-lookup inner product) +
    * exact fp32 cosine re-rank — the shared tail of [[search]] and
    * [[searchIvfPq]]. `corpus` must carry a `codes` column. `bias` adds a
    * per-row base score BEFORE ranking — residual encoding's
    * `⟨q, μ_cell⟩` term, so the ADC estimate is ⟨q, μ⟩ + ⟨q, r̂⟩ ≈ ⟨q, x⟩.
    */
  private def adcRerank(corpus: DataFrame, cb: Codebook, q: Array[Double],
                        emb: DataFrame, queryId: Long,
                        k: Int, rerank: Int,
                        bias: Option[Column] = None): DataFrame = {
    val tables = cb.centers.zipWithIndex.map { case (cs, m) =>
      cs.map(c => c.zip(q.slice(m * SubDim, (m + 1) * SubDim))
        .map { case (a, b) => a * b }.sum)
    }
    val tablesLit = tables.map(_.mkString("array(", ",", ")"))
      .mkString("CAST(array(", ",", ") AS ARRAY<ARRAY<DOUBLE>>)")
    val lookup = expr(
      s"aggregate(zip_with(codes, $tablesLit, (c, t) -> element_at(t, c + 1)), " +
        "0D, (acc, v) -> acc + v)")
    val cands = corpus
      .withColumn("adc", bias.fold(lookup)(b => b + lookup))
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

  /** ADC top-k for `queryId`'s vector: code-scan candidates (top
    * `rerank` by table-lookup inner product), exact fp32 cosine re-rank.
    */
  def search(spark: SparkSession, emb: DataFrame, queryId: Long, k: Int,
             rerank: Int = 50, seed: Long = 42L,
             kCentroids: Int = K): DataFrame =
    searchWith(spark, emb, fit(emb, seed, kCentroids = kCentroids),
      queryId, k, rerank)

  /** [[search]] over an ALREADY-fitted codebook — lets callers that need
    * the codebook matrices (the v10 replay oracle) share one fit with the
    * search.
    */
  def searchWith(spark: SparkSession, emb: DataFrame, cb: Codebook,
                 queryId: Long, k: Int, rerank: Int = 50): DataFrame = {
    GraftFunctions.register(spark)
    val corpus = encode(emb.filter(col("vec_id") =!= queryId), cb)
    adcRerank(corpus, cb, queryVec(emb, queryId), emb, queryId, k, rerank)
  }

  /** IVF-PQ: the coarse quantizer picks the `nProbe` nearest cells
    * ([[IvfIndex]]), the ADC code scan covers only those cells' rows, and
    * survivors pay the exact re-rank — cell pruning multiplies with the
    * code bandwidth cut (probe ¼ of the corpus at ¼ the bytes/vector ⇒
    * ~16× less scan work than brute force). RESIDUAL encoding (FAISS's
    * IVF-PQ default): the codebook quantizes `x − μ_cell`, whose
    * within-cell spread is far tighter than the raw corpus's, and the ADC
    * estimate becomes `⟨q, μ_cell⟩ + Σ_m table[m][code_m]` — same code
    * bytes, materially better candidate precision. At 100 TB the corpus
    * would be written partitioned by `cell` so a probe prunes to its
    * cells' FILES.
    */
  def searchIvfPq(spark: SparkSession, emb: DataFrame, queryId: Long, k: Int,
                  nClusters: Int = 16, nProbe: Int = 4,
                  rerank: Int = 50, seed: Long = 42L): DataFrame = {
    val (assigned, centers) = IvfIndex.fit(emb, nClusters, seed)
    val cb = fitResidual(assigned, centers, seed)
    searchIvfPqWith(spark, emb, assigned, centers, cb, queryId, k, nProbe, rerank)
  }

  /** [[searchIvfPq]] over ALREADY-fitted models — lets callers that need
    * the centroid/codebook matrices (the v12 replay oracle) share one fit
    * with the search.
    */
  def searchIvfPqWith(spark: SparkSession, emb: DataFrame, assigned: DataFrame,
                      centers: Array[Array[Double]], cb: Codebook,
                      queryId: Long, k: Int, nProbe: Int = 4,
                      rerank: Int = 50): DataFrame = {
    GraftFunctions.register(spark)
    val q = queryVec(emb, queryId)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val probes = centers.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(q).map { case (a, b) => a * b }.sum
      val norm = math.sqrt(c.map(x => x * x).sum)
      (i, if (norm == 0) -1.0 else dot / (norm * qNorm))
    }.sortBy { case (i, cos) => (-cos, i) }.take(nProbe).map(_._1)
    val corpus = encode(
      assigned.filter(col("cell").isin(probes: _*))
        .filter(col("vec_id") =!= queryId)
        .withColumn("resid", residualCol(centers)), cb, "resid")
    val cellDotLit = centers.map(c =>
      c.zip(q).map { case (a, b) => a * b }.sum)
      .mkString("CAST(array(", ",", ") AS ARRAY<DOUBLE>)")
    adcRerank(corpus, cb, q, emb, queryId, k, rerank,
      bias = Some(expr(s"element_at($cellDotLit, cell + 1)")))
  }
}
