package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions
import graft.lake.MergeTable

/** PERSISTED IVF-PQ index — the production shape of the v5/v10/v12 ANN
  * ladder (FAISS persists exactly this trio): the coarse-quantizer
  * centroids, the PQ codebooks, and the per-vector codes live as three
  * MergeTables, so
  *
  *  - training happens ONCE ([[build]]); later batches [[append]] by
  *    encoding against the PERSISTED models — O(batch), zero refit, the
  *    same incremental discipline the dedup ladder's d13 LSH index
  *    follows;
  *  - the codes table is PARTITIONED BY `cell`, so a probe's
  *    `cell IN (…)` prunes to the probed cells' FILES (the commit-log
  *    partition pruning every MergeTable read gets) — at 100 TB a
  *    4-of-64-cell probe reads 1/16th of the code bytes, which are
  *    themselves ~32× smaller than the fp32 vectors;
  *  - a fresh [[Handle]] re-opened from disk searches with NO in-memory
  *    state — what makes the index shareable across jobs;
  *  - model tables are versioned MergeTables: a retrain is one atomic
  *    overwrite, time-travelable like any other table.
  *
  * Reference scope: the reference has no vector ops (SURVEY §2 marks the
  * family absent) — this extends the engine for LLM-pipeline workloads.
  */
object PersistedAnnIndex {

  /** Index location on disk; all state lives under `root`. */
  final case class Handle(root: String) {
    private[graft] def centroidsTable = new MergeTable(s"$root/centroids")
    private[graft] def codebookTable = new MergeTable(s"$root/codebooks")
    private[graft] def codesTable = new MergeTable(s"$root/codes", Seq("cell"))
  }

  private val centroidSchema = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("centroid", ArrayType(DoubleType, containsNull = false))))
  private val codebookSchema = StructType(Seq(
    StructField("m", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("centroid", ArrayType(DoubleType, containsNull = false))))

  /** Train the coarse quantizer + PQ codebooks on the first batch and
    * persist all three tables. Training is bounded-sample driver k-means
    * (the IvfIndex/PqIndex discipline); encode + write stay distributed.
    */
  def build(spark: SparkSession, emb: DataFrame, root: String,
            nClusters: Int = 16, seed: Long = 42L): Handle = {
    val h = Handle(root)
    val (assigned, centers) = IvfIndex.fit(emb, nClusters, seed)
    val cb = PqIndex.fit(emb, seed)
    h.centroidsTable.overwrite(spark.createDataFrame(
      java.util.Arrays.asList(centers.zipWithIndex.map { case (c, i) =>
        Row(i, c.toSeq) }: _*), centroidSchema))
    h.codebookTable.overwrite(spark.createDataFrame(
      java.util.Arrays.asList(cb.centers.zipWithIndex.flatMap { case (cs, m) =>
        cs.zipWithIndex.map { case (c, k) => Row(m, k, c.toSeq) } }: _*),
      codebookSchema))
    h.codesTable.overwrite(PqIndex.encode(assigned, cb)
      .select("vec_id", "label", "cell", "codes"))
    h
  }

  /** Centroids back from disk, ordered by cell id — metadata-sized
    * (nClusters × dim doubles), the only index state a search collects.
    */
  private def loadCentroids(spark: SparkSession, h: Handle): Array[Array[Double]] =
    h.centroidsTable.read(spark).orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)

  private def loadCodebook(spark: SparkSession, h: Handle): PqIndex.Codebook = {
    val rows = h.codebookTable.read(spark).orderBy("m", "code").collect()
    val grouped = rows.groupBy(_.getInt(0))
    PqIndex.Codebook(Array.tabulate(grouped.size)(m =>
      grouped(m).sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)))
  }

  /** Encode a NEW batch against the PERSISTED models and append its codes —
    * O(batch) work, no refit, no touch of existing code files beyond the
    * appended partitions. Exactly d13's index-maintenance shape.
    */
  def append(spark: SparkSession, h: Handle, batch: DataFrame): Unit = {
    val centers = loadCentroids(spark, h)
    val cb = loadCodebook(spark, h)
    h.codesTable.append(PqIndex.encode(IvfIndex.assign(batch, centers), cb)
      .select("vec_id", "label", "cell", "codes"))
  }

  /** IVF-PQ search over the PERSISTED index: probe selection on the
    * centroid table (driver, metadata-sized), ADC code scan over ONLY the
    * probed cells (partition-pruned read of the codes table), exact fp32
    * cosine re-rank of the survivors via a key join back to the corpus —
    * candidates are `rerank` rows, so the join is broadcast-sized.
    */
  def search(spark: SparkSession, h: Handle, emb: DataFrame, queryId: Long,
             k: Int, nProbe: Int = 4, rerank: Int = 50,
             filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    GraftFunctions.register(spark)
    val centers = loadCentroids(spark, h)
    val cb = loadCodebook(spark, h)
    val q = emb.filter(col("vec_id") === queryId)
      .select("embedding").head.getSeq[Float](0).toArray.map(_.toDouble)
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val probes = centers.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(q).map { case (a, b) => a * b }.sum
      val norm = math.sqrt(c.map(x => x * x).sum)
      (i, if (norm == 0) -1.0 else dot / (norm * qNorm))
    }.sortBy { case (i, cos) => (-cos, i) }.take(nProbe).map(_._1)
    val tables = cb.centers.zipWithIndex.map { case (cs, m) =>
      cs.map(c => c.zip(q.slice(m * PqIndex.SubDim, (m + 1) * PqIndex.SubDim))
        .map { case (a, b) => a * b }.sum)
    }
    val tablesLit = tables.map(_.mkString("array(", ",", ")"))
      .mkString("CAST(array(", ",", ") AS ARRAY<ARRAY<DOUBLE>>)")
    // the connector read pushes the cell filter into the commit log's
    // partition pruning — only the probed cells' FILES are scanned
    // FILTERED vector search (the production-hot shape): the predicate is
    // applied at the INDEX SCAN — before any ADC scoring — so non-matching
    // codes are never scored and the rerank pool is all-eligible
    // (pre-filtering; post-filtering would silently shrink k under
    // selective predicates). The predicate speaks the codes table's
    // metadata columns (vec_id / label / cell) and rides the connector
    // read's pushdown alongside the cell partition pruning.
    val scan = spark.read.format("graft").load(s"${h.root}/codes")
      .filter(col("cell").isin(probes.map(Int.box): _*))
      .filter(col("vec_id") =!= queryId)
    val cands = filter.fold(scan)(scan.filter)
      .withColumn("adc", expr(
        s"aggregate(zip_with(codes, $tablesLit, (c, t) -> element_at(t, c + 1)), " +
          "0D, (acc, v) -> acc + v)"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rerank)
      .select("vec_id", "label")
    val query = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
      .withColumn("q_norm", expr("sqrt(float_dot(q_emb, q_emb))"))
    cands.join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .crossJoin(broadcast(query))
      .withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
      .withColumn("cosine",
        round(expr("float_dot(embedding, q_emb)") / (col("norm") * col("q_norm")), 6))
      .select("vec_id", "label", "cosine")
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
