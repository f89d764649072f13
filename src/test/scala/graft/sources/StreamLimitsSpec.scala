package graft.sources

import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import graft.lake.MergeTable
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Admission control on the connector's streaming sources:
  * maxBytesPerTrigger on the snapshot source, maxFilesPerTrigger +
  * Trigger.AvailableNow on the CDF source.
  */
class StreamLimitsSpec extends SparkSpec {
  import spark.implicits._

  test("maxBytesPerTrigger bounds each micro-batch by added bytes") {
    val root = scratch("sl_bytes")
    val t = new MergeTable(root)
    t.overwrite(Seq(1, 2).toDF("k").repartition(1))  // v0
    t.append(Seq(3, 4).toDF("k").repartition(1))     // v1
    t.append(Seq(5, 6).toDF("k").repartition(1))     // v2
    val batches = new AtomicLong()
    val rows = new AtomicLong()
    val q = spark.readStream.format("graft")
      .option("path", root).option("maxBytesPerTrigger", "1").load()
      .writeStream
      .option("checkpointLocation", scratch("sl_bytes_ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet(); rows.addAndGet(b.count()); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(rows.get === 6L)
    assert(batches.get >= 3,
      s"a 1-byte cap must admit exactly one commit per batch, got ${batches.get}")
  }

  test("CDF source: maxFilesPerTrigger + AvailableNow drain and resume") {
    val root = scratch("sl_cdf")
    val t = new MergeTable(root)
    t.overwrite(Seq(1, 2, 3, 4).toDF("k").repartition(1))      // v0, no feed
    (1 to 3).foreach(i => t.delete(spark, col("k") === i, changeFeed = true))
    val ckpt = scratch("sl_cdf_ckpt")
    def drain(): (Long, Long) = {
      val batches = new AtomicLong(); val rows = new AtomicLong()
      val q = spark.readStream.format("graft")
        .option("path", root).option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "1").load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.incrementAndGet(); rows.addAndGet(b.count()); ()
        }
        .start()
      assert(q.awaitTermination(300000), "AvailableNow must self-terminate")
      (batches.get, rows.get)
    }
    val (b1, r1) = drain()
    assert(r1 === 3L, "three delete images")
    assert(b1 >= 3, s"one feed file per batch expected, got $b1 batches")
    // a later commit is only seen by the NEXT drain
    t.delete(spark, col("k") === 4, changeFeed = true)
    val (b2, r2) = drain()
    assert(r2 === 1L && b2 >= 1 && b2 <= 2,
      s"the second drain must cover only the tail, got $b2 batches / $r2 rows")
  }

  test("where option: rows filtered AND batch files pruned by stats") {
    val root = scratch("sl_where")
    // unpartitioned, k-stats, range-disjoint files: pruning must engage
    // through MIN/MAX stats, not partition directories
    val t = new MergeTable(root, Nil, statsCols = Seq("k"))
    t.overwrite(Seq(1, 2).toDF("k").repartition(1))      // v0: k ∈ [1,2]
    t.append(Seq(10, 11).toDF("k").repartition(1))       // v1: k ∈ [10,11]
    t.append(Seq(20, 21).toDF("k").repartition(1))       // v2: k ∈ [20,21]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream.format("graft")
      .option("path", root).option("where", "k >= 10 AND k < 20").load()
      .writeStream
      .option("checkpointLocation", scratch("sl_where_ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows ++= b.select("k").as[Int](org.apache.spark.sql.Encoders.scalaInt)
          .collect(); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(rows.sorted === Seq(10, 11), "the where option filters batch rows")
    val (tot, kept) = (MergeTable.lastStreamPrune._1, MergeTable.lastStreamPrune._2)
    assert(kept === 1L && tot === 3L,
      s"stats pruning must keep exactly the [10,11] file, kept $kept of $tot")
    // a non-deterministic predicate is rejected loudly at query start
    val bad = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val qb = spark.readStream.format("graft")
        .option("path", root).option("where", "rand() > 0.5").load()
        .writeStream
        .option("checkpointLocation", scratch("sl_where_bad_ckpt"))
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try qb.processAllAvailable() finally qb.stop()
    }
    assert(bad.getMessage.contains("deterministic") ||
      Option(bad.getCause).exists(_.getMessage.contains("deterministic")))
  }
}
