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
    // Both probe sides read the pinned snapshots THROUGH data skipping:
    // the batch's doc ids (for the mutated docs' own rows) and their
    // band signatures (for the collision partners) are batch-bounded
    // driver lists, so every read below prunes the snapshot's files by
    // min/max stats before scanning — at scale the index is opened only
    // where a matching doc_id or sig could live, never end to end.
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
    val touchedIds = touched.collect().map(r => r.getLong(0): Any)
    val addIdSet = addIds.collect().map(r => r.getLong(0): Any).toSet

    def pairDelta(ver: Long, ids: Array[Any]): DataFrame = {
      if (ver < 0 || ids.isEmpty) return emptyPairs
      // own rows: file-pruned by doc_id, exact-filtered above the scan
      val rows = sliceBy(ver, "doc_id", ids).filter(col("doc_id").isin(ids: _*))
      // collision partners: file-pruned by the rows' sig values (a
      // 4-per-doc, batch-bounded driver list)
      val sigs = rows.select("sig").distinct().collect()
        .map(r => r.getString(0): Any)
      if (sigs.isEmpty) return emptyPairs
      pairsOf(rows, sliceBy(ver, "sig", sigs), threshold)
    }
    val edgeMut = pairDelta(v - 1, touchedIds)
      .withColumn(MergeTable.ChangeType, lit("delete"))
      .unionByName(pairDelta(v, touchedIds.filter(addIdSet.contains))
        .withColumn(MergeTable.ChangeType, lit("insert")))
      .withColumn(MergeTable.CommitVersion, lit(batchId))

    // stage 3: edges + labels (their own txn markers; replay converges)
    IncrementalCc.applyBatch(edgeMut, batchId, edges, labels, appId)
    fin.unpersist()
    processed
  }
}
