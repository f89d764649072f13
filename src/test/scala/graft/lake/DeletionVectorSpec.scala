package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Deletion vectors ([[MergeTable.deleteVectorized]]): delete-by-mask
  * semantics, the no-rewrite property, mask accumulation, interaction with
  * every rewrite path (merge / update / compact), restore/clone binding
  * carry, the mass-delete fallback, and the broadcast-anti-join plan shape.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Int, String, String)]): DataFrame =
    rows.toDF("k", "v", "p")

  private def asSet(d: DataFrame): Set[(Int, String, String)] =
    d.select("k", "v", "p").collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  private val base = Seq(
    (1, "a", "p1"), (2, "b", "p1"), (3, "a", "p2"), (4, "b", "p2"), (5, "c", "p2"))

  test("dv delete masks rows WITHOUT rewriting any data file") {
    val t = new MergeTable(scratch("dv_basic"), Seq("p"))
    t.overwrite(df(base))
    val v0Files = t.filesOf(0)
    t.deleteVectorized(spark, col("v") === "a")
    // same physical files, one new version, rows masked
    assert(t.currentVersion === 1)
    assert(t.filesOf(1) === v0Files)
    assert(asSet(t.read(spark)) ===
      Set((2, "b", "p1"), (4, "b", "p2"), (5, "c", "p2")))
    assert(t.deletionVectors.map(_._3).sum === 2)
    // time travel: v0 still shows the masked rows
    assert(t.readVersion(spark, 0).count() === 5)
  }

  test("dv delete keeps predicate-NULL rows, like the rewriting delete") {
    val t = new MergeTable(scratch("dv_null"), Seq("p"))
    t.overwrite(Seq((1, "a", "p1"), (2, null, "p1"), (3, "b", "p1"))
      .toDF("k", "v", "p"))
    t.deleteVectorized(spark, col("v") === "a")
    assert(t.read(spark).select("k").as[Int].collect().toSet === Set(2, 3))
  }

  test("consecutive dv deletes accumulate masks over the same files") {
    val t = new MergeTable(scratch("dv_accum"), Seq("p"))
    t.overwrite(df(base))
    val files = t.filesOf(0)
    t.deleteVectorized(spark, col("v") === "a")
    t.deleteVectorized(spark, col("k") === 2)
    assert(t.filesOf(t.currentVersion) === files)
    assert(asSet(t.read(spark)) === Set((4, "b", "p2"), (5, "c", "p2")))
    // cumulative count covers both deletes
    assert(t.deletionVectors.map(_._3).sum === 3)
  }

  test("dv delete matching nothing commits metadata-only, no bindings") {
    val t = new MergeTable(scratch("dv_noop"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("v") === "zzz")
    assert(t.currentVersion === 1)
    assert(t.deletionVectors.isEmpty)
    assert(t.read(spark).count() === 5)
  }

  test("mass deletes fall back to the rewriting delete (bounded masks)") {
    val t = new MergeTable(scratch("dv_fallback"), Seq("p"))
    t.overwrite(df(base))
    val v0Files = t.filesOf(0)
    t.deleteVectorized(spark, col("v") === "a", maxNewDvRows = 1)
    // rewrite path: touched files replaced, nothing masked
    assert(t.deletionVectors.isEmpty)
    assert(t.filesOf(t.currentVersion) !== v0Files)
    assert(asSet(t.read(spark)) ===
      Set((2, "b", "p1"), (4, "b", "p2"), (5, "c", "p2")))
  }

  test("merge over a masked table never resurrects masked rows; rewritten files shed bindings") {
    val t = new MergeTable(scratch("dv_merge"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("k") === 1) // masks a p1-file row
    // touches the file holding k=2 (same p1 file as masked k=1)
    t.merge(spark, df(Seq((2, "B", "p1"), (9, "z", "p3"))), Seq("k"))
    assert(asSet(t.read(spark)) ===
      Set((2, "B", "p1"), (3, "a", "p2"), (4, "b", "p2"), (5, "c", "p2"), (9, "z", "p3")))
    // the rewritten file's binding died with its manifest reference
    val stillBound = t.deletionVectors.map(_._1).toSet
    assert(stillBound.intersect(t.filesOf(t.currentVersion).toSet) === stillBound)
  }

  test("update over a masked table applies to live rows only") {
    val t = new MergeTable(scratch("dv_update"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("k") === 3) // a v="a" row in p2
    t.update(spark, col("v") === "a", Map("v" -> lit("A")))
    assert(asSet(t.read(spark)) ===
      Set((1, "A", "p1"), (2, "b", "p1"), (4, "b", "p2"), (5, "c", "p2")))
  }

  test("compact materializes survivors and clears all bindings") {
    val t = new MergeTable(scratch("dv_compact"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("v") === "a")
    t.compact(spark)
    assert(t.deletionVectors.isEmpty)
    assert(asSet(t.read(spark)) ===
      Set((2, "b", "p1"), (4, "b", "p2"), (5, "c", "p2")))
  }

  test("restore rolls masks back and forth with the rows") {
    val t = new MergeTable(scratch("dv_restore"), Seq("p"))
    t.overwrite(df(base))            // v0: 5 rows
    t.deleteVectorized(spark, col("v") === "a") // v1: 3 live
    t.restore(0)                     // v2 = v0 state
    assert(t.read(spark).count() === 5)
    assert(t.deletionVectors.isEmpty)
    t.restore(1)                     // v3 = v1 state: masks re-bound
    assert(t.read(spark).count() === 3)
    assert(t.deletionVectors.nonEmpty)
  }

  test("clone carries masks (and their sidecars) to the target") {
    val t = new MergeTable(scratch("dv_clone_src"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("v") === "a")
    val c = t.cloneTo(scratch("dv_clone_dst") + "/t")
    assert(asSet(c.read(spark)) === asSet(t.read(spark)))
    assert(c.deletionVectors.map(_._3).sum === 2)
  }

  test("dv delete records a change feed of the masked rows") {
    val t = new MergeTable(scratch("dv_cdf"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("v") === "a", changeFeed = true)
    val ch = t.changes(spark, 1, 1)
    assert(ch.filter(col(MergeTable.ChangeType) === "delete").count() === 2)
    assert(ch.select("k").as[Int].collect().toSet === Set(1, 3))
  }

  test("vacuum keeps referenced dv sidecars; reads survive") {
    val t = new MergeTable(scratch("dv_vacuum"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("v") === "a")
    t.merge(spark, df(Seq((9, "z", "p3"))), Seq("k")) // one more version
    t.vacuum(retainVersions = 1, minAgeMs = 0)
    assert(asSet(t.read(spark)) ===
      Set((2, "b", "p1"), (4, "b", "p2"), (5, "c", "p2"), (9, "z", "p3")))
  }

  test("plan: dv read is a broadcast anti-join, never a shuffled join") {
    val t = new MergeTable(scratch("dv_plan"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("v") === "a")
    val plan = t.read(spark).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast LEFT ANTI dv mask, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dv mask shuffled the table:\n$plan")
  }

  test("dv masks bind across hostile partition-dir escaping") {
    // space, ':' (Spark-escaped on disk) and '+' (bare on disk, but the
    // char where URI- and form-decoding of the scan path disagree): the
    // sidecar key must round-trip to the exact manifest string
    val t = new MergeTable(scratch("dv_esc"), Seq("p"))
    t.overwrite(Seq((1, "a", "p 1:a+b"), (2, "b", "p 1:a+b"), (3, "a", "p2"))
      .toDF("k", "v", "p"))
    t.deleteVectorized(spark, col("v") === "a")
    assert(t.read(spark).select("k").as[Int].collect().toSet === Set(2))
    assert(t.deletionVectors.map(_._1).toSet.subsetOf(t.filesOf(1).toSet),
      "dv binding keys must be manifest strings")
  }

  test("history names the vectorized delete distinctly") {
    val t = new MergeTable(scratch("dv_hist"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("v") === "a")
    val ops = t.history(spark).select("operation").as[String].collect().toSeq
    assert(ops.contains("DELETE (DV)"))
  }

  test("reorgPurge rewrites ONLY masked files; clean files carry by reference") {
    val t = new MergeTable(scratch("dv_reorg"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("p") === "p2" && col("v") === "a") // masks p2's file only
    val before = t.filesOf(t.currentVersion)
    val masked = t.deletionVectors.map(_._1).toSet
    assert(masked.nonEmpty && masked.size < before.size)
    t.reorgPurge(spark)
    val after = t.filesOf(t.currentVersion).toSet
    assert(t.deletionVectors.isEmpty, "purge must shed every dv binding")
    assert(before.filterNot(masked).forall(after.contains),
      "clean files must carry forward by reference")
    assert(masked.forall(f => !after.contains(f)), "masked files must be rewritten")
    assert(asSet(t.read(spark)) ===
      Set((1, "a", "p1"), (2, "b", "p1"), (4, "b", "p2"), (5, "c", "p2")))
    // the pre-purge masked snapshot is still exact under time travel
    assert(asSet(t.readVersion(spark, 1)) ===
      Set((1, "a", "p1"), (2, "b", "p1"), (4, "b", "p2"), (5, "c", "p2")))
    // a mask-free table: purge is a no-op, not a new version
    val v = t.currentVersion
    t.reorgPurge(spark)
    assert(t.currentVersion === v)
  }

  test("vacuum dry run previews exactly what vacuum reclaims, deleting nothing") {
    val t = new MergeTable(scratch("dv_vac_dry"), Seq("p"))
    t.overwrite(df(Seq((1, "a", "p1"))))            // v0 → data dir A
    t.overwrite(df(Seq((2, "b", "p1"))))            // v1 → dir B; A doomed at retain=1
    val planned = t.vacuumDryRun(retainVersions = 1, minAgeMs = 0L)
    assert(planned.nonEmpty)
    // preview is side-effect-free: nothing deleted, horizon unmoved
    assert(t.vacuumHorizon === 0L)
    planned.foreach(p => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, p)), s"$p deleted by dry run"))
    assert(asSet(t.readVersion(spark, 0)) === Set((1, "a", "p1")))
    // the real vacuum deletes exactly the preview
    t.vacuum(retainVersions = 1, minAgeMs = 0L)
    planned.foreach(p => assert(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, p)), s"$p not reclaimed"))
    assert(asSet(t.read(spark)) === Set((2, "b", "p1")))
  }

  test("partition-scoped dv-merges: probe prunes, disjoint races rebase") {
    val t = new MergeTable(scratch("dv_kdp"), Seq("p"))
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p2"))))
    // partition-scoped dv-merge updates only its partition's files
    t.mergeVectorized(spark, df(Seq((1, "A", "p1"))), Seq("k"),
      keysDeterminePartitions = true)
    assert(asSet(t.read(spark)) ===
      Set((1, "A", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p2")))
    // disjoint concurrent dv-merges: the loser re-binds, both land
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val go = new CountDownLatch(1)
    val failures = new java.util.concurrent.atomic.AtomicInteger
    Seq(df(Seq((2, "B", "p1"))), df(Seq((3, "C", "p2")))).foreach { s0 =>
      pool.execute { () =>
        go.await()
        try t.mergeVectorized(spark, s0, Seq("k"), keysDeterminePartitions = true)
        catch { case _: Throwable => failures.incrementAndGet() }
      }
    }
    go.countDown(); pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.get === 0, "disjoint dv-merges must both land")
    assert(asSet(t.read(spark)) ===
      Set((1, "A", "p1"), (2, "B", "p1"), (3, "C", "p2"), (4, "d", "p2")))
  }
}
