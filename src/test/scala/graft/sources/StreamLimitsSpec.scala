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
}
