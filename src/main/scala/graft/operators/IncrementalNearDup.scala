package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.lake.MergeTable
import graft.queries.DedupQueries

/** END-TO-END incremental fuzzy dedup — the full near-dup clustering
  * pipeline maintained from ONE corpus change feed under arbitrary
  * mutation, composing the engine's two retraction-correct maintenance
  * operators per micro-batch:
  *
  *   corpus CDF ─→ [[LshMaintenance]] (banded-MinHash signature index)
  *              ─→ pair-delta derivation (this object — the glue stage)
  *              ─→ [[IncrementalCc]] (edges + component labels)
  *
  * After every batch the edge table equals the est ≥ τ candidate-pair set
  * over the CURRENT corpus and the labels table equals its connected
  * components — the st29 gate hash-matches the clustering against
  * DuckDB's replay of the whole MinHash chain plus a recursive min-label
  * walk over the post-mutation corpus.
  *
  * The pair delta is DELTA-SIZED and REPLAY-PURE by construction. Only
  * pairs involving a mutated doc can change (other docs' signatures are
  * untouched), so:
  *
  *  - retractions = est ≥ τ partners of the mutated docs' OLD signature
  *    rows, probed against the PRE-batch index;
  *  - insertions  = est ≥ τ partners of the surviving docs' NEW rows,
  *    probed against the POST-batch index (same-batch inserts see each
  *    other — their rows are already in that snapshot);
  *  - a pair present on both sides (an update that keeps the pair) nets
  *    to its insert inside [[IncrementalCc.applyBatch]]'s per-key window.
  *
  * Both probes read the index THROUGH TIME TRAVEL pinned to the LSH
  * commit this batch produced (txn marker → commit version v; pre = v−1,
  * post = v), never through `currentVersion` — so a crash-replayed batch
  * derives the IDENTICAL pair delta even after later batches advanced
  * the index, and each stage's own txn markers (LSH: `<appId>x`; CC:
  * `<appId>e`/`<appId>l`) make every crash point converge. The probes
  * are (band, sig) equi-joins of batch-sized row sets against one index
  * snapshot — the d13 lookup shape; agreement over the 16 stored
  * minhashes estimates Jaccard exactly as the batch pipeline does.
  */
object IncrementalNearDup {

  private val hashCols: Seq[String] =
    (0 until DedupQueries.NumHashes).map(i => s"h$i")

  /** Did the last [[applyBatch]]'s index probes ride the In()-list file
    * pruning (batch under `spark.graft.pruneInMax`) or fall back to the
    * unpruned snapshot read? Observability for the spec that pins both
    * paths to identical state.
    */
  @volatile var lastProbePruned: Boolean = false

  /** est ≥ `threshold` canonical pairs `(src < dst)` between `rows` (a
    * batch-bounded subset of index rows) and `whole` (a file-pruned
    * slice of one index snapshot — sound, because the pruning keeps
    * every file that could hold a matching sig). Never all-pairs:
    * candidates come from the (band, sig) equi-join, est from the
    * stored minhash agreement.
    */
  private def pairsOf(rows: DataFrame, whole: DataFrame,
                      threshold: Double): DataFrame = {
    val x = rows.select(col("doc_id").as("xd") +: col("band") +: col("sig") +:
      hashCols.map(h => col(h).as(s"x$h")): _*)
    val y = whole.select(col("doc_id").as("yd") +: col("band") +: col("sig") +:
      hashCols.map(h => col(h).as(s"y$h")): _*)
    val agree = hashCols.map(h =>
      when(col(s"x$h") === col(s"y$h"), 1).otherwise(0)).reduce(_ + _)
    x.join(y, Seq("band", "sig"))
      .filter(col("xd") =!= col("yd"))
      .filter(agree.cast("double") / DedupQueries.NumHashes >= threshold)
      .select(least(col("xd"), col("yd")).as("src"),
        greatest(col("xd"), col("yd")).as("dst"))
      .distinct()
  }

  /** Apply one corpus CDF micro-batch (doc_id, text, change-feed
    * metadata) to the (index, edges, labels) state triple. Returns the
    * net per-DOC change count (the delta-size observable).
    */
  def applyBatch(batch: DataFrame, batchId: Long, index: MergeTable,
                 edges: MergeTable, labels: MergeTable, appId: String,
                 threshold: Double = 0.5): Long = {
    val sess = batch.sparkSession
    if (batch.isEmpty) return 0L

    // stage 1: the signature index (its own txn marker; replay skips)
    val processed = LshMaintenance.applyBatch(batch, batchId, index, appId + "x")

    // stage 2: the pair delta, pinned to stage 1's commit via time travel
    val v = index.txnCommitVersion(appId + "x", batchId).getOrElse(
      throw new IllegalStateException(
        s"LSH maintenance left no commit for batch $batchId of $appId — " +
          "the pair delta cannot be pinned"))
    // Both probe sides read the pinned snapshots THROUGH data skipping
    // while the batch is small: the batch's doc ids (for the mutated
    // docs' own rows) and their band signatures (for the collision
    // partners) become In()-list FILE-pruning predicates — but only
    // below `spark.graft.pruneInMax` values, because a driver list that
    // grows with the micro-batch would bloat the plan itself (the r12
    // verdict's st29 scale note). Past the cap the probe reads the
    // snapshot unpruned — sound, pruning is an optimization — and the
    // EXACT row filters are broadcast semi-joins in every case, so no
    // plan ever embeds a row-count-sized literal list.
    val pruneInMax = sess.conf.get("spark.graft.pruneInMax", "10000").toLong
    def sliceBy(ver: Long, col0: String, vals: Array[Any]): DataFrame = {
      val kept = index.pruneFilesFor(sess, ver,
        Seq(org.apache.spark.sql.sources.In(col0, vals)))
      index.readVersionFiles(sess, ver, kept)
    }
    val emptyPairs = sess.range(0)
      .select(col("id").as("src"), col("id").as("dst"))

    val wDoc = Window.partitionBy("doc_id")
      .orderBy(col(MergeTable.CommitVersion).desc, col("_is_add").cast("int").desc)
    val fin = batch
      .withColumn("_is_add",
        col(MergeTable.ChangeType).isin("insert", "update_postimage"))
      .withColumn("_rn", row_number().over(wDoc)).filter(col("_rn") === 1)
      .select("doc_id", "_is_add")
      .persist()
    val touched = fin.select("doc_id")
    val addIds = fin.filter(col("_is_add")).select("doc_id")
    // cap + 1 as a LIMITed collect: one job answers "is it small enough?"
    // and "what are the values?" together, and can never pull more than
    // cap + 1 rows to the driver however large the batch is
    val sampleN = (pruneInMax.min(Int.MaxValue - 1).toInt) + 1

    def pairDelta(ver: Long, idsDf: DataFrame): DataFrame = {
      if (ver < 0) return emptyPairs
      val idSample = idsDf.limit(sampleN).collect()
      if (idSample.isEmpty) return emptyPairs
      lastProbePruned = idSample.length <= pruneInMax
      // own rows: file-pruned by doc_id while the list is metadata-sized,
      // exact-filtered by a broadcast semi-join above the scan
      val scanned =
        if (idSample.length <= pruneInMax)
          sliceBy(ver, "doc_id", idSample.map(r => r.getLong(0): Any))
        else index.readVersion(sess, ver)
      val rows = scanned.join(broadcast(idsDf), Seq("doc_id"), "left_semi")
      // collision partners: file-pruned by the rows' sig values (4 per
      // doc) under the same cap; the (band, sig) equi-join in pairsOf is
      // the exact filter, so an unpruned partner side stays correct
      val sigSample = rows.select("sig").distinct().limit(sampleN).collect()
      if (sigSample.isEmpty) return emptyPairs
      val whole =
        if (sigSample.length <= pruneInMax)
          sliceBy(ver, "sig", sigSample.map(r => r.getString(0): Any))
        else index.readVersion(sess, ver)
      pairsOf(rows, whole, threshold)
    }
    val edgeMut = graft.lake.Timing.time("nd.pairDelta")(pairDelta(v - 1, touched)
      .withColumn(MergeTable.ChangeType, lit("delete"))
      .unionByName(pairDelta(v, addIds)
        .withColumn(MergeTable.ChangeType, lit("insert")))
      .withColumn(MergeTable.CommitVersion, lit(batchId)))

    // stage 3: edges + labels (their own txn markers; replay converges)
    IncrementalCc.applyBatch(edgeMut, batchId, edges, labels, appId)
    fin.unpersist()
    processed
  }
}
