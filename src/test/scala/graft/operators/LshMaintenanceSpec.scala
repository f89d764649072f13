package graft.operators

import graft.SparkSpec
import graft.lake.MergeTable
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LshMaintenance semantics the st25 gate cannot pin deterministically:
  * in-place re-signing on update, sub-shingle-floor retraction, and
  * order-independence when a commit's update pre/postimage files land in
  * different micro-batches (the full-minhash-vector drop guard). After
  * every batch the index must equal `bandedSignatures` of the live docs —
  * the invariant is asserted directly, so every path is checked against
  * the batch build it claims to maintain.
  */
class LshMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val tA = "the cat sat on the mat"
  private val tB = "a dog ran over the hill to the barn"
  private val tA2 = "the cat sat on the red mat"
  private val short = "no pair" // 2 words: below the 3-word shingle floor

  private def batchOf(rows: (Long, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", MergeTable.ChangeType,
      MergeTable.CommitVersion)

  /** The maintained rows must equal the batch build over the live docs. */
  private def assertEquals(index: MergeTable, live: Seq[(Long, String)],
                           clue: String): Unit = {
    val want = DedupQueries.bandedSignatures(live.toDF("doc_id", "text"))
      .collect().map(_.mkString("|")).toSet
    val got = index.read(spark).select(
        col("doc_id") +: (0 until DedupQueries.NumHashes).map(i => col(s"h$i"))
          :+ col("band") :+ col("sig"): _*)
      .collect().map(_.mkString("|")).toSet
    assert(got == want, s"$clue: maintained index diverged from batch build")
  }

  test("insert, in-place re-sign, floor retraction, and delete all converge") {
    val index = new MergeTable(s"${scratch("lshm")}/idx", Seq("band"))
    var b = 0L
    def apply(rows: (Long, String, String, Long)*): Long = {
      b += 1
      LshMaintenance.applyBatch(batchOf(rows: _*), b, index, "lshmtest")
    }
    assert(apply((1L, tA, "insert", 1L), (2L, tB, "insert", 1L)) == 2L)
    assertEquals(index, Seq(1L -> tA, 2L -> tB), "after inserts")
    // update re-signs in place (same (doc_id, band) keys, new sig)
    apply((1L, tA, "update_preimage", 2L), (1L, tA2, "update_postimage", 2L))
    assertEquals(index, Seq(1L -> tA2, 2L -> tB), "after re-sign")
    // update below the shingle floor retracts every band row
    apply((2L, tB, "update_preimage", 3L), (2L, short, "update_postimage", 3L))
    assertEquals(index, Seq(1L -> tA2), "after floor retraction")
    // corpus delete removes the doc
    apply((1L, tA2, "delete", 4L))
    assert(index.read(spark).count() == 0, "delete must empty the index")
    // and a sub-floor doc never registers in the first place
    apply((9L, short, "insert", 5L))
    assert(index.read(spark).count() == 0)
  }

  test("update THEN delete collapsed into ONE batch still tears down") {
    // the net image is the delete's post-update preimage (tA2), but the
    // index is signed from tA — the observed-identities guard must cover
    // every epoch the batch carried, or the rows strand forever
    val index = new MergeTable(s"${scratch("lshm_updel")}/idx", Seq("band"))
    LshMaintenance.applyBatch(batchOf((1L, tA, "insert", 1L)), 1L, index, "lshmtest")
    LshMaintenance.applyBatch(batchOf(
      (1L, tA, "update_preimage", 2L), (1L, tA2, "update_postimage", 2L),
      (1L, tA2, "delete", 3L)), 2L, index, "lshmtest")
    assert(index.read(spark).count() == 0,
      "an update+delete batch must remove the doc signed under the OLD text")
    // and the orphaned-preimage protection still holds: a lone preimage
    // from a superseded epoch cannot tear down a newer registration
    val idx2 = new MergeTable(s"${scratch("lshm_updel2")}/idx", Seq("band"))
    LshMaintenance.applyBatch(batchOf((1L, tA, "insert", 1L)), 1L, idx2, "lshmtest")
    LshMaintenance.applyBatch(batchOf((1L, tA2, "update_postimage", 2L)), 2L, idx2, "lshmtest")
    LshMaintenance.applyBatch(batchOf((1L, tA, "update_preimage", 2L)), 3L, idx2, "lshmtest")
    assertEquals(idx2, Seq(1L -> tA2), "orphan preimage after re-sign")
  }

  test("split update pre/postimage batches converge in EITHER order") {
    for (postFirst <- Seq(true, false)) {
      val index = new MergeTable(s"${scratch(s"lshm_split_$postFirst")}/idx",
        Seq("band"))
      var b = 0L
      def apply(rows: (Long, String, String, Long)*): Unit = {
        b += 1
        LshMaintenance.applyBatch(batchOf(rows: _*), b, index, "lshmtest")
        ()
      }
      apply((1L, tA, "insert", 1L), (2L, tB, "insert", 1L))
      val pre = (1L, tA, "update_preimage", 2L)
      val post = (1L, tA2, "update_postimage", 2L)
      if (postFirst) { apply(post); apply(pre) } else { apply(pre); apply(post) }
      // the orphaned preimage must NOT tear down the re-signed registration
      assertEquals(index, Seq(1L -> tA2, 2L -> tB),
        s"postFirst=$postFirst")
    }
  }

  test("a replayed batch is skipped by the txn marker, with a replay-stable count") {
    val index = new MergeTable(s"${scratch("lshm_replay")}/idx", Seq("band"))
    val first = LshMaintenance.applyBatch(
      batchOf((1L, tA, "insert", 1L)), 1L, index, "lshmtest")
    val v = index.currentVersion
    // the net-change observable must NOT under-count on recovery: the
    // replay reports the same delta it did the first time (gates sum it)
    assert(LshMaintenance.applyBatch(
      batchOf((1L, tA, "insert", 1L)), 1L, index, "lshmtest") == first)
    assert(index.currentVersion == v, "replay must not publish a new commit")
    assertEquals(index, Seq(1L -> tA), "after replay")
  }
}
