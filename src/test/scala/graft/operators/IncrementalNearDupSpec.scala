package graft.operators

import graft.SparkSpec
import graft.lake.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IncrementalNearDup's probe discipline: the pair delta must be
  * IDENTICAL whether the index probes ride the In()-list file pruning
  * (small batches) or the unpruned fallback (batches past
  * `spark.graft.pruneInMax`) — pruning is an optimization, never a
  * correctness dependency — and the exact row filters are semi-joins, so
  * the fallback path embeds no row-count-sized literal lists in the plan.
  */
class IncrementalNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val tA = "the quick brown fox jumps over the lazy dog again and again"
  private val tB = "an entirely different document about streams lakes and commit logs"
  private val tC = "a third text mentioning none of the other documents at all here"

  private def batchOf(rows: (Long, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", MergeTable.ChangeType, MergeTable.CommitVersion)

  /** Run the two-batch mutate history into fresh state tables; returns
    * (edges rows, label rows) for equality comparison.
    */
  private def runHistory(root: String, app: String): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val index = new MergeTable(s"$root/idx", Seq("band"))
    val edges = IncrementalCc.edgesTable(spark, s"$root/edges")
    val labels = IncrementalCc.labelsTable(spark, s"$root/labels")
    // batch 1: docs 1,2 duplicates (pair), 3 unrelated
    IncrementalNearDup.applyBatch(batchOf(
      (1L, tA, "insert", 1L), (2L, tA, "insert", 1L), (3L, tB, "insert", 1L)),
      1L, index, edges, labels, app)
    // batch 2: doc 2 rewrites away (pair 1-2 retracts), doc 4 joins doc 1,
    // doc 3 deletes
    IncrementalNearDup.applyBatch(batchOf(
      (2L, tA, "update_preimage", 2L), (2L, tC, "update_postimage", 2L),
      (3L, tB, "delete", 2L), (4L, tA, "insert", 2L)),
      2L, index, edges, labels, app)
    val e = edges.read(spark).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = labels.read(spark).select("id", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (e, l)
  }

  test("pruned and unpruned probe paths produce identical pair deltas and labels") {
    val pruned = runHistory(scratch("ndp_pruned"), "nd1")
    assert(IncrementalNearDup.lastProbePruned,
      "a 4-doc batch must ride the In()-list pruning by default")
    assert(pruned._1.contains((1L, 4L)), s"expected the 1-4 pair, got ${pruned._1}")
    assert(!pruned._1.exists(p => p._1 == 2L || p._2 == 2L),
      "the rewritten doc's pair must retract")
    spark.conf.set("spark.graft.pruneInMax", "0")
    try {
      val unpruned = runHistory(scratch("ndp_full"), "nd2")
      assert(!IncrementalNearDup.lastProbePruned,
        "pruneInMax=0 must force the unpruned fallback")
      assert(unpruned == pruned,
        s"fallback state must equal the pruned path: $unpruned vs $pruned")
    } finally spark.conf.unset("spark.graft.pruneInMax")
  }
}
