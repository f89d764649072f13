package graft.operators

import graft.SparkSpec
import graft.lake.MergeTable
import org.apache.spark.sql.DataFrame

/** TWO maintenance instances racing the SAME micro-batch with real
  * threads — the accidental double-deployment of an always-on curation
  * job. The per-sink txn markers plus the lake layer's optimistic
  * concurrency (a losing commit rebases, sees the batch's marker already
  * recorded, and returns as a replay) must make the race converge to the
  * single-instance state no matter how the threads interleave: whichever
  * instance loses the commit race contributes NOTHING. st26 gates the
  * deterministic interleaving (sequential dual-apply) against the DuckDB
  * oracle; this spec exercises the genuinely concurrent schedule.
  */
class ConcurrentCurationSpec extends SparkSpec {
  import spark.implicits._

  private val tA = "the cat and the dog ran to the house"
  private val tB = "a bird of the north flew to warm lands"
  private val tC = "the ship and its crew sailed of to sea"
  private val emptyGrams = Seq.empty[String].toDF("gram")

  private def batchOf(rows: (Long, String, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", "source", MergeTable.ChangeType,
      MergeTable.CommitVersion)

  private def stateOf(fps: MergeTable, curated: MergeTable): (Set[String], Set[String]) = (
    fps.read(spark).select("doc_id", "h", "source", "n_tok", "ok")
      .collect().map(_.mkString("|")).toSet,
    curated.read(spark).select("doc_id", "source", "n_tok")
      .collect().map(_.mkString("|")).toSet)

  test("two threads racing one batch converge to the single-instance state") {
    val b1 = batchOf((5L, tA, "s", "insert", 1L), (6L, tB, "s", "insert", 1L))
    // batch 2 exercises all merge directions under the race: a smaller-id
    // dup demotes doc 5, doc 6 is deleted, doc 9 inserts fresh
    val b2 = batchOf((2L, tA, "s", "insert", 2L), (6L, tB, "s", "delete", 2L),
      (9L, tC, "s", "insert", 2L))

    // control: single instance
    val rootC = scratch("ccur_ctl")
    val fpsC = new MergeTable(s"$rootC/fps")
    val curC = new MergeTable(s"$rootC/cur")
    IncrementalCuration.applyBatch(b1, 1L, fpsC, curC, emptyGrams, "ccur")
    IncrementalCuration.applyBatch(b2, 2L, fpsC, curC, emptyGrams, "ccur")
    val want = stateOf(fpsC, curC)

    // raced: bootstrap batch 1 single-threaded (the overwrite path has no
    // merge-level rebase), then two threads race batch 2 through FRESH
    // handles, released together by a start latch
    val root = scratch("ccur_race")
    IncrementalCuration.applyBatch(b1, 1L,
      new MergeTable(s"$root/fps"), new MergeTable(s"$root/cur"),
      emptyGrams, "ccur")
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        val fps = new MergeTable(s"$root/fps")
        val cur = new MergeTable(s"$root/cur")
        start.await()
        try IncrementalCuration.applyBatch(b2, 2L, fps, cur, emptyGrams, "ccur")
        catch { case t: Throwable => errs.add(t) }
        ()
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"racing instances must not fail: ${errs.peek()}")

    val fps = new MergeTable(s"$root/fps")
    val cur = new MergeTable(s"$root/cur")
    assert(stateOf(fps, cur) == want,
      "the thread race must converge to the single-instance state")
    assert(fps.lastTxnVersion("ccurf").contains(2L) &&
        cur.lastTxnVersion("ccurc").contains(2L),
      "both state tables must carry exactly the batch's marker")
    // and a later replay of the raced batch is still a no-op
    val (vF, vC) = (fps.currentVersion, cur.currentVersion)
    IncrementalCuration.applyBatch(b2, 2L, fps, cur, emptyGrams, "ccur")
    assert(fps.currentVersion == vF && cur.currentVersion == vC)
  }
}
