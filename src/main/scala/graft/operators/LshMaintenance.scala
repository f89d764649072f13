package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.lake.MergeTable
import graft.queries.DedupQueries

/** RETRACTION-CORRECT maintenance of d13's persisted LSH index — the
  * near-dup twin of [[IncrementalCuration]]: the banded-MinHash signature
  * table is maintained from the corpus table's change feed under ARBITRARY
  * mutation. Inserts sign and register, corpus DELETEs remove the doc's
  * band rows, UPDATEs re-sign in place (an update that drops below the
  * 3-word shingle floor retracts the rows entirely), and a commit whose
  * pre/postimage files land in different micro-batches converges in either
  * order. After every batch the index equals `bandedSignatures(corpus)` —
  * d13's batch build over the CURRENT snapshot — plus one bookkeeping
  * column (`thash`, below); the st25 gate hash-matches the candidate-pair
  * query against the DuckDB replay.
  *
  * One clause-merge per batch, keyed `(doc_id, band)` — the index's full
  * primary key, since [[DedupQueries.bandedSignatures]] emits exactly one
  * row per (doc, band):
  *
  *  1. the CDF rows resolve to one NET image per doc (last commit version
  *     wins; postimage beats preimage within a version) — delta-sized;
  *  2. docs that EXIST after the batch contribute `put` rows (their new
  *     signatures) plus unconditional `del` rows for any band the new text
  *     no longer signs (the sub-3-word retraction case — signing yields
  *     no rows, but the old rows must still go);
  *  3. docs GONE after the batch contribute `del` rows for every band,
  *     CONDITIONED on `array_contains(s.old_thashes, t.thash)` — `thash`
  *     is md5 of the text each registration was signed FROM, stored beside
  *     the signature, and `old_thashes` is md5 of EVERY image text the
  *     batch carried for the doc (a multi-commit batch can update then
  *     delete; the index may be signed from any of the observed epochs,
  *     never from an unobserved one). The guard is what makes a preimage
  *     arriving AFTER its postimage harmless (the re-signed registration's
  *     thash is not among the orphan's observed texts, the teardown
  *     no-ops — IncrementalCuration's `old_h` discipline). The minhash
  *     vector itself cannot serve as this identity: near-equal texts AGREE
  *     on minhashes by design — that is the one collision LSH optimizes
  *     FOR — while distinct md5s are exactly what the dedup family already
  *     treats as distinct-text truth;
  *  4. the merge publishes under the caller's txn marker; replay skips.
  *
  * Scale: net-change resolution, signing, and the merge source are all
  * O(batch); the index is partitioned by `band` and `band` is a merge key,
  * so the touched-file probe and rewrite prune to the touched bands'
  * files — the corpus is never re-shingled, the index never rescanned.
  */
object LshMaintenance {

  private val hashCols: Seq[String] =
    (0 until DedupQueries.NumHashes).map(i => s"h$i")

  /** Apply one CDF micro-batch of the corpus table (columns: doc_id, text,
    * change-feed metadata) to the signature index. Returns the net per-doc
    * change count (the delta-size observable st25's gate requires on).
    */
  def applyBatch(batch: DataFrame, batchId: Long, index: MergeTable,
                 appId: String): Long =
    graft.lake.Timing.time("lsh.applyBatch")(applyBatch0(batch, batchId, index, appId))

  private def applyBatch0(batch: DataFrame, batchId: Long, index: MergeTable,
                 appId: String): Long = {
    val sess = batch.sparkSession

    // 1. net image per doc — the IncrementalCuration window, verbatim.
    // Counted BEFORE the replay gate below: the per-doc net count is the
    // gate's delta-size OBSERVABLE, and a crash-replayed batch must
    // report the same number it did the first time (the batch frame is
    // deterministic) or the sum would under-count after recovery.
    val wDoc = Window.partitionBy("doc_id")
      .orderBy(col(MergeTable.CommitVersion).desc, col("_is_add").cast("int").desc)
    val fin = batch
      .withColumn("_is_add",
        col(MergeTable.ChangeType).isin("insert", "update_postimage"))
      .withColumn("_rn", row_number().over(wDoc)).filter(col("_rn") === 1)
      .select("doc_id", "text", "_is_add")
      .persist()
    val processed = graft.lake.Timing.time("lsh.netCount")(fin.count())
    if (index.lastTxnVersion(appId).exists(_ >= batchId)) {
      fin.unpersist(); return processed // replayed batch: state already applied
    }
    val allBands = sess.range(DedupQueries.Bands)
      .select(col("id").cast("int").as("band"))

    // 2. live docs: new signatures as `put` (carrying the signed-from
    // text's md5), plus unconditional `del` for bands the new text no
    // longer produces (sub-shingle-floor retraction)
    val adds = fin.filter(col("_is_add")).select("doc_id", "text")
    val reg = DedupQueries.bandedSignatures(adds)
      .join(adds.select(col("doc_id"), md5(col("text")).as("thash")), Seq("doc_id"))
    val putRows = reg.withColumn("action", lit("put"))
    val addDel = adds.select("doc_id").crossJoin(allBands)
      .join(reg.select("doc_id", "band"), Seq("doc_id", "band"), "left_anti")

    // 3. gone docs: every band, guarded by the doc's OBSERVED identities —
    // ALL image texts the batch carried for it, not just the net one. A
    // multi-commit batch can hold update(T0→T1) THEN delete: the net image
    // is the delete's T1 preimage, but the index (which never saw the
    // superseded postimage) is still signed from T0 — so a single-hash
    // guard would no-op and strand the rows. The observed set always
    // contains the indexed text for a true delete (either the delete
    // preimage itself, or the intervening update's preimage), while an
    // orphaned preimage alone still cannot tear down a registration
    // re-signed in an earlier batch (its T1 is not in the set).
    val dropDel = fin.filter(!col("_is_add")).select("doc_id")
      .join(batch.groupBy("doc_id")
          .agg(collect_set(md5(col("text"))).as("old_thashes")),
        Seq("doc_id"), "left")
      .crossJoin(allBands)
    val delRows = addDel
      .withColumn("old_thashes", lit(null).cast("array<string>"))
      .select("doc_id", "band", "old_thashes")
      .unionByName(dropDel.select("doc_id", "band", "old_thashes"))
      .withColumn("action", lit("del"))

    val src = putRows.unionByName(delRows, allowMissingColumns = true)
    if (!index.exists) {
      index.overwrite(reg, txn = Some(appId -> batchId))
    } else {
      index.mergeClauses(sess, src, Seq("doc_id", "band"),
        Seq(MergeTable.MatchedDelete(Some(
              "s.action = 'del' AND (s.old_thashes IS NULL " +
                "OR array_contains(s.old_thashes, t.thash))")),
            MergeTable.MatchedUpdate(Some("s.action = 'put'"),
              hashCols.map(h => h -> s"s.$h") ++
                Seq("sig" -> "s.sig", "thash" -> "s.thash")),
            MergeTable.NotMatchedInsert(Some("s.action = 'put'"),
              (Seq("doc_id", "band", "sig", "thash") ++ hashCols).map(c => c -> s"s.$c"))),
        checkUniqueSource = false, keysDeterminePartitions = true,
        txn = Some(appId -> batchId))
    }
    fin.unpersist()
    processed
  }
}
