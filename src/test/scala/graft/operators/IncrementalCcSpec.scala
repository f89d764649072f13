package graft.operators

import graft.SparkSpec
import graft.lake.MergeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IncrementalCc.applyBatch semantics the st28 gate cannot pin cheaply:
  * split-on-delete correctness on a controlled graph, replay idempotence,
  * the between-commits crash replay (CDF-derived relabel), and the
  * bucket-pruning observable.
  */
class IncrementalCcSpec extends SparkSpec {
  import spark.implicits._

  private def batchOf(rows: (Long, Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("src", "dst", MergeTable.ChangeType, MergeTable.CommitVersion)

  private def labelMap(t: MergeTable): Map[Long, Long] =
    t.read(spark).select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("adds merge, deletes split, labels equal the batch recompute") {
    val root = scratch("inccc")
    val edges = IncrementalCc.edgesTable(spark, s"$root/edges")
    val labels = IncrementalCc.labelsTable(spark, s"$root/labels")
    // batch 1: two chains 1-2-3-4 and 5-6
    assert(IncrementalCc.applyBatch(batchOf(
      (1L, 2L, "insert", 1L), (2L, 3L, "insert", 1L), (3L, 4L, "insert", 1L),
      (5L, 6L, "insert", 1L)), 1L, edges, labels, "ct1") == 4L)
    assert(labelMap(labels) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
    // batch 2: bridge 4-5 merges the components
    IncrementalCc.applyBatch(batchOf((4L, 5L, "insert", 2L)),
      2L, edges, labels, "ct1")
    assert(labelMap(labels) ==
      (1L to 6L).map(_ -> 1L).toMap, "bridge must merge to one component")
    // batch 3: delete 2-3 SPLITS into {1,2} and {3,4,5,6}
    IncrementalCc.applyBatch(batchOf((2L, 3L, "delete", 3L)),
      3L, edges, labels, "ct1")
    assert(labelMap(labels) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 3L, 6L -> 3L), "delete must split and relabel the right half")
    // batch 4: delete 5-6 AND 4-5 — 5 and 6 fall out as singletons
    IncrementalCc.applyBatch(batchOf(
      (4L, 5L, "delete", 4L), (5L, 6L, "delete", 4L)), 4L, edges, labels, "ct1")
    assert(labelMap(labels) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 6L), "orphaned members must become singletons")
    // edge rows carry their component label (the pruning invariant)
    val bad = edges.read(spark)
      .join(labels.read(spark).toDF("id", "l", "lbx"),
        col("a") === col("id"))
      .filter(col("label") =!= col("l")).count()
    assert(bad == 0L, "every edge row must carry its component's label")
  }

  test("replay of a fully-applied batch is a content no-op; counts are stable") {
    val root = scratch("inccc_replay")
    val edges = IncrementalCc.edgesTable(spark, s"$root/edges")
    val labels = IncrementalCc.labelsTable(spark, s"$root/labels")
    val b1 = batchOf((1L, 2L, "insert", 1L), (3L, 4L, "insert", 1L))
    assert(IncrementalCc.applyBatch(b1, 1L, edges, labels, "ct2") == 2L)
    val before = (edges.currentVersion, labels.currentVersion, labelMap(labels))
    assert(IncrementalCc.applyBatch(b1, 1L, edges, labels, "ct2") == 2L,
      "a replayed batch must report the same net count")
    assert((edges.currentVersion, labels.currentVersion, labelMap(labels)) == before,
      "a replayed batch must publish no new commit")
  }

  private def copyDir(src: String, dst: String): Unit = {
    import java.nio.file._
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("replay after a crash BETWEEN the edges and labels commits converges") {
    val root = scratch("inccc_crash")
    val edges = IncrementalCc.edgesTable(spark, s"$root/edges")
    val labels = IncrementalCc.labelsTable(spark, s"$root/labels")
    IncrementalCc.applyBatch(batchOf(
      (1L, 2L, "insert", 1L), (2L, 3L, "insert", 1L), (3L, 4L, "insert", 1L),
      (7L, 8L, "insert", 1L)), 1L, edges, labels, "ct3")
    // batch 2 splits {1..4} and bridges 4-7; snapshot labels BEFORE it
    copyDir(s"$root/labels", s"$root/labels_snap")
    val b2 = batchOf((2L, 3L, "delete", 2L), (4L, 7L, "insert", 2L))
    IncrementalCc.applyBatch(b2, 2L, edges, labels, "ct3")
    val want = labelMap(labels)
    val wantEv = edges.currentVersion
    // crash simulation: edges committed, labels rolled back to pre-batch
    graft.queries.Registry.cleanDir(s"$root/labels")
    copyDir(s"$root/labels_snap", s"$root/labels")
    val labels2 = MergeTable.open(s"$root/labels")
    val edges2 = MergeTable.open(s"$root/edges")
    assert(IncrementalCc.applyBatch(b2, 2L, edges2, labels2, "ct3") == 2L)
    assert(edges2.currentVersion == wantEv,
      "replay must SKIP the already-marked edges merge")
    assert(labelMap(labels2) == want,
      "between-commits crash + replay must converge to the no-crash state")
    assert(want == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 7L -> 3L, 8L -> 3L))
  }

  test("distributed relabel (ccDriverRelabelMax=0) yields the union-find path's labels") {
    // the giant-component path: force EVERY subgraph through the
    // distributed min-label propagation and replay the first suite's
    // merge/split/orphan history — labels must be identical
    spark.conf.set("spark.graft.ccDriverRelabelMax", "0")
    try {
      val root = scratch("inccc_dist")
      val edges = IncrementalCc.edgesTable(spark, s"$root/edges")
      val labels = IncrementalCc.labelsTable(spark, s"$root/labels")
      assert(IncrementalCc.applyBatch(batchOf(
        (1L, 2L, "insert", 1L), (2L, 3L, "insert", 1L), (3L, 4L, "insert", 1L),
        (5L, 6L, "insert", 1L)), 1L, edges, labels, "ct5") == 4L)
      assert(labelMap(labels) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        5L -> 5L, 6L -> 5L))
      IncrementalCc.applyBatch(batchOf((4L, 5L, "insert", 2L)),
        2L, edges, labels, "ct5")
      assert(labelMap(labels) == (1L to 6L).map(_ -> 1L).toMap)
      IncrementalCc.applyBatch(batchOf((2L, 3L, "delete", 3L)),
        3L, edges, labels, "ct5")
      assert(labelMap(labels) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
        5L -> 3L, 6L -> 3L), "the LP path must split exactly like union-find")
      IncrementalCc.applyBatch(batchOf(
        (4L, 5L, "delete", 4L), (5L, 6L, "delete", 4L)), 4L, edges, labels, "ct5")
      assert(labelMap(labels) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
        5L -> 5L, 6L -> 6L), "LP-path orphans must become singletons")
    } finally spark.conf.unset("spark.graft.ccDriverRelabelMax")
  }

  test("state probes prune files to touched buckets") {
    val root = scratch("inccc_prune")
    spark.conf.set("spark.graft.ccLabelBuckets", "4")
    spark.conf.set("spark.graft.ccIdBuckets", "4")
    val edges = try IncrementalCc.edgesTable(spark, s"$root/edges")
      finally spark.conf.unset("spark.graft.ccLabelBuckets")
    val labels = try IncrementalCc.labelsTable(spark, s"$root/labels")
      finally spark.conf.unset("spark.graft.ccIdBuckets")
    // 8 disjoint 2-node components, labels 10,20,..,80 → all 4 buckets
    val b1 = (1 to 8).flatMap(i =>
      Seq((i * 10L, i * 10L + 1L, "insert", 1L)))
    IncrementalCc.applyBatch(batchOf(b1: _*), 1L, edges, labels, "ct4")
    assert(edges.read(spark).select(IncrementalCc.EdgeBucketCol)
      .distinct().count() >= 2, "fixture must span several buckets")
    // batch 2 touches ONE component — both probes must prune
    IncrementalCc.applyBatch(batchOf((11L, 12L, "insert", 2L)),
      2L, edges, labels, "ct4")
    assert(IncrementalCc.lastLabelFilesRead < IncrementalCc.lastLabelFilesTotal,
      s"labels probe must prune: ${IncrementalCc.lastLabelFilesRead}/${IncrementalCc.lastLabelFilesTotal}")
    assert(IncrementalCc.lastEdgeFilesRead < IncrementalCc.lastEdgeFilesTotal,
      s"edges probe must prune: ${IncrementalCc.lastEdgeFilesRead}/${IncrementalCc.lastEdgeFilesTotal}")
    assert(labelMap(labels).get(12L).contains(10L))
  }
}
