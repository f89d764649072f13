package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** [[MergeTable.readStream]]: the table as a full streaming source —
  * snapshot rows arrive as version-stamped inserts, later commits' CDF
  * rows follow, pre-snapshot feeds are excluded, and dv-masked snapshots
  * materialize instead of linking.
  */
class StreamTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Int, String, String)]): DataFrame =
    rows.toDF("k", "v", "p")

  private def drain(src: DataFrame, name: String): DataFrame = {
    val q = src.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", scratch(s"ckpt_$name")).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("snapshot arrives as inserts; later feeds follow; earlier feeds excluded") {
    val t = new MergeTable(scratch("sts_basic"), Seq("p"))
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p2"))))               // v0
    t.merge(spark, df(Seq((3, "c", "p1"))), Seq("k"), changeFeed = true) // v1 (pre-snapshot feed)
    val snapV = t.currentVersion                                        // 1
    val src = t.readStream(spark, snapshotVersion = Some(snapV))
    t.merge(spark, df(Seq((4, "d", "p2"))), Seq("k"), changeFeed = true) // v2
    t.delete(spark, col("k") === 1, changeFeed = true)                   // v3
    val got = drain(src, "sts_basic_sink")
    val byType = got.groupBy(MergeTable.ChangeType).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // snapshot (3 rows incl. v1's merge result) + v2 insert + v3 delete;
    // v1's own feed rows must NOT replay
    assert(byType("insert") === 3 + 1)
    assert(byType("delete") === 1)
    assert(got.filter(col(MergeTable.CommitVersion) === 1 &&
      col(MergeTable.ChangeType) =!= "insert").count() === 0)
    val versions = got.select(MergeTable.CommitVersion).as[Long].collect().toSet
    assert(versions === Set(1L, 2L, 3L))
  }

  test("a feedless table streams its snapshot and picks up future feeds") {
    val t = new MergeTable(scratch("sts_nofeed"), Seq("p"))
    t.overwrite(df(Seq((1, "a", "p1"))))
    val src = t.readStream(spark)
    t.merge(spark, df(Seq((2, "b", "p1"))), Seq("k"), changeFeed = true)
    val got = drain(src, "sts_nofeed_sink")
    assert(got.count() === 2) // 1 snapshot insert + 1 feed insert
  }

  test("dv-masked snapshot materializes: masked rows never stream") {
    val t = new MergeTable(scratch("sts_dv"), Seq("p"))
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"))))
    t.deleteVectorized(spark, col("k") === 2)
    val got = drain(t.readStream(spark), "sts_dv_sink")
    assert(got.select("k").as[Int].collect().toSet === Set(1, 3))
  }

  test("renamed columns stream under their logical names from linked files") {
    val t = new MergeTable(scratch("sts_cmap"), Seq("p"))
    t.overwrite(df(Seq((1, "a", "p1"))))
    t.renameColumn("v", "label")
    val got = drain(t.readStream(spark), "sts_cmap_sink")
    assert(got.columns.contains("label") && !got.columns.contains("v"))
    assert(got.select("label").as[String].head() === "a")
  }

  test("restarting from the same snapshot version does not replay the snapshot") {
    val t = new MergeTable(scratch("sts_restart"), Seq("p"))
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p2"))))
    val snapV = t.currentVersion
    val ckpt = scratch("ckpt_sts_restart")
    val out = scratch("out_sts_restart")
    def run(): Long = {
      // parquet sink: the memory sink cannot recover from a checkpoint
      val q = t.readStream(spark, snapshotVersion = Some(snapV))
        .writeStream.format("parquet").outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).option("path", out).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(run() === 2)
    t.merge(spark, df(Seq((3, "c", "p1"))), Seq("k"), changeFeed = true)
    // second run, SAME checkpoint: only the new feed's insert is appended
    assert(run() === 3)
  }
}
