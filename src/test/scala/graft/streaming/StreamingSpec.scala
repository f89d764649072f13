package graft.streaming

import graft.SparkSpec
import graft.pipeline.{CallCenterPipeline, Fixture}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import java.sql.Timestamp
import java.time.LocalDate

/** Streaming layer: checkpointed foreachBatch ingest (files consumed
  * exactly once, merge keeps re-delivery idempotent) and
  * flatMapGroupsWithState sessionization (in-batch gap splits + event-time
  * timeout flush driven by the watermark).
  */
class StreamingSpec extends SparkSpec {

  private val date = LocalDate.of(2026, 8, 12)

  test("streaming ingest: drain, checkpoint, re-deliver — silver stays keyed") {
    val root = scratch("stream_ingest")
    val p = CallCenterPipeline.LakePaths(s"$root/lake")
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"

    Fixture.writeCsv(src, "batch1.csv", Fixture.initialBatch)
    StreamingIngest.runOnce(spark, src, p, date, ckpt)
    val silver1 = CallCenterPipeline.silverTable(p).read(spark)
    assert(silver1.count() === 4)
    assert(silver1.filter(col("call_id") === 101).collect().head
      .getAs[String]("call_status") === "COMPLETED")

    // second drain with the SAME checkpoint: only the new file is read;
    // the re-delivered call_id 101 upserts, nothing duplicates.
    Fixture.writeCsv(src, "batch2.csv", Fixture.redelivery)
    StreamingIngest.runOnce(spark, src, p, date, ckpt)
    val silver2 = CallCenterPipeline.silverTable(p).read(spark)
    assert(silver2.count() === 4)
    assert(silver2.filter(col("call_id") === 101).collect().head
      .getAs[String]("call_status") === "DROPPED")
    // exceptions appended once per DELIVERED batch containing them: 6 total
    // (batch2 has no invalid rows, and batch1 was not re-read).
    assert(spark.read.parquet(p.exception).count() === 6)
  }

  test("flatMapGroupsWithState sessionization: gap split + watermark timeout flush") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = Timestamp.valueOf(s"2026-08-12 $hhmm:00")
    def us(hhmm: String) = ts(hhmm).getTime * 1000L

    val input = MemoryStream[StreamingOps.Evt]
    val sessions = StreamingOps.sessionize(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sess_sink")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session); user 1 again at
      // 11:00 (> 30 min gap ⇒ in-batch split once data arrives);
      // user 2: single event.
      input.addData(
        StreamingOps.Evt.at(1, ts("10:00")), StreamingOps.Evt.at(1, ts("10:10")),
        StreamingOps.Evt.at(2, ts("10:05")))
      q.processAllAvailable()
      input.addData(StreamingOps.Evt.at(1, ts("11:00")))
      q.processAllAvailable()
      // watermark push: 14:00 event ⇒ watermark 13:00 ⇒ every session with
      // last+gap < 13:00 times out and flushes.
      input.addData(StreamingOps.Evt.at(99, ts("14:00")))
      q.processAllAvailable()

      val out = spark.table("sess_sink")
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(out === Set(
        (1L, us("10:00"), us("10:10"), 2L), // split by the 11:00 arrival
        (1L, us("11:00"), us("11:00"), 1L), // flushed by timeout
        (2L, us("10:05"), us("10:05"), 1L), // flushed by timeout
      ))
      // user 99's open session must still be buffered, not emitted
      assert(!out.exists(_._1 == 99L))
    } finally q.stop()
  }

  test("st7 IVM sink: delta-sized merges, zero-group deletes, replay-proof") {
    import spark.implicits._
    import graft.lake.MergeTable
    val gold = new MergeTable(scratch("ivm_gold"), Seq("o_orderstatus"))
    def cdf(rows: (String, Long, String)*) =
      rows.toDF("o_orderstatus", "o_orderkey", MergeTable.ChangeType)
    def state(): Map[String, (Long, Long)] =
      gold.read(spark).select("o_orderstatus", "n", "key_sum").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // batch 0: inserts → bootstrap
    graft.queries.StreamQueries.applyGoldDelta(gold,
      cdf(("A", 1L, "insert"), ("A", 2L, "insert"), ("B", 10L, "insert")), 0L)
    assert(state() === Map("A" -> (2L, 3L), "B" -> (1L, 10L)))

    // batch 1: A loses a row; B's row moves to C; replay of batch 1 must be
    // a no-op (txn marker)
    val b1 = cdf(("A", 1L, "delete"),
      ("B", 10L, "update_preimage"), ("C", 10L, "update_postimage"))
    graft.queries.StreamQueries.applyGoldDelta(gold, b1, 1L)
    val after1 = state()
    assert(after1 === Map("A" -> (1L, 2L), "C" -> (1L, 10L)),
      "zero-count group B must be DELETED, changed groups merged")
    graft.queries.StreamQueries.applyGoldDelta(gold, b1, 1L) // crash replay
    assert(state() === after1, "replayed batch double-applied")

    // the sink is delta-sized: batch 2 touches only group C — group A's
    // file must be carried forward by reference, never rewritten
    val filesBefore = gold.filesOf(gold.currentVersion).toSet
    graft.queries.StreamQueries.applyGoldDelta(gold, cdf(("C", 11L, "insert")), 2L)
    val carried = gold.filesOf(gold.currentVersion).toSet.intersect(filesBefore)
    assert(carried.nonEmpty, "no file carried forward — sink rewrote the whole gold table")
    assert(state() === Map("A" -> (1L, 2L), "C" -> (2L, 21L)))
  }

  test("st7 IVM sink: a mass-delete batch zeroes MANY groups in one distributed merge") {
    import spark.implicits._
    import graft.lake.MergeTable
    val gold = new MergeTable(scratch("ivm_mass"), Seq("o_orderstatus"))
    val n = 500
    // bootstrap: one row per group
    val boot = (0 until n).map(i => (s"g$i", i.toLong, "insert"))
      .toDF("o_orderstatus", "o_orderkey", MergeTable.ChangeType)
    graft.queries.StreamQueries.applyGoldDelta(gold, boot, 0L, appId = "mass")
    assert(gold.read(spark).count() === n.toLong)
    // a source-truncation CDC batch deletes EVERY row: all groups reach
    // zero. This must flow through the single clause-merge (no driver
    // collect of the gone keys, no literal isin list) and land in ONE
    // commit for the batch — the old delete-then-merge path took two.
    val vBefore = gold.currentVersion
    val wipe = (0 until n).map(i => (s"g$i", i.toLong, "delete"))
      .toDF("o_orderstatus", "o_orderkey", MergeTable.ChangeType)
    graft.queries.StreamQueries.applyGoldDelta(gold, wipe, 1L, appId = "mass")
    assert(gold.read(spark).count() === 0L, "every zeroed group must be deleted")
    assert(gold.currentVersion === vBefore + 1,
      "gone-group deletes must ride the SAME merge commit as the upserts")
  }

  test("st9 fan-out: per-sink txn markers heal a crash between the two applies") {
    import spark.implicits._
    import graft.lake.MergeTable
    val a = new MergeTable(scratch("fan_a"), Seq("o_orderstatus"))
    val b = new MergeTable(scratch("fan_b"), Seq("o_orderstatus"))
    def cdf(rows: (String, Long, String)*) =
      rows.toDF("o_orderstatus", "o_orderkey", MergeTable.ChangeType)
    def state(t: MergeTable): Map[String, (Long, Long)] =
      t.read(spark).select("o_orderstatus", "n", "key_sum").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def applyBoth(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      graft.queries.StreamQueries.applyGoldDelta(a, batch, id, appId = "fa")
      graft.queries.StreamQueries.applyGoldDelta(b, batch, id, appId = "fb")
    }
    val b0 = cdf(("A", 1L, "insert"), ("B", 10L, "insert"))
    applyBoth(b0, 0L)
    // batch 1 lands on sink a, then the job "crashes" before sink b
    val b1 = cdf(("A", 2L, "insert"), ("B", 10L, "delete"))
    graft.queries.StreamQueries.applyGoldDelta(a, b1, 1L, appId = "fa")
    assert(state(a) === Map("A" -> (2L, 3L)))
    assert(state(b) === Map("A" -> (1L, 1L), "B" -> (1L, 10L)), "b must lag")
    // replay of batch 1 applies to BOTH — a's marker makes it a no-op there,
    // b catches up; a shared marker would have left b behind forever
    applyBoth(b1, 1L)
    assert(state(a) === Map("A" -> (2L, 3L)), "sink a double-applied")
    assert(state(b) === Map("A" -> (2L, 3L)), "sink b missed the replay")
  }
}
