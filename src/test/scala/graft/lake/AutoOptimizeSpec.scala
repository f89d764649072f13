package graft.lake

import graft.SparkSpec

/** Delta's autoOptimize pair as table properties: optimizeWrite
  * (AQE-rebalanced appends — advisory-sized files instead of one sliver
  * per write task) and autoCompact (post-append bin-packing of the
  * TOUCHED partitions once they cross minNumFiles).
  */
class AutoOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def filesPerDir(t: MergeTable): Map[String, Int] =
    t.filesOf(t.currentVersion).groupBy { f =>
      val segs = f.split('/'); segs.slice(1, segs.length - 1).mkString("/")
    }.map { case (d, fs) => d -> fs.size }

  test("optimizeWrite coalesces a many-task append to advisory-sized files") {
    val root = scratch("ow")
    val t = new MergeTable(root, Seq("p"))
    t.overwrite(Seq((0, "seed", "p1")).toDF("k", "v", "p"))
    t.setProperties(Map(MergeTable.OptimizeWriteProp -> "true"))
    // 16 upstream tasks would normally write up to 16 slivers per
    // partition dir; the rebalance folds them to advisory-sized files
    // (tiny data => exactly one per partition value)
    val batch = (1 to 2000).map(i => (i, s"v$i", s"p${i % 2 + 1}"))
      .toDF("k", "v", "p").repartition(16)
    t.append(batch)
    val perDir = filesPerDir(t)
    assert(perDir.keys.toSet === Set("p=p1", "p=p2"))
    assert(perDir.values.forall(_ <= 3),
      s"optimizeWrite must bound files per partition, got $perDir")
    assert(t.read(spark).count() === 2001L)
  }

  test("without optimizeWrite the same append writes one file per task") {
    val root = scratch("ow_off")
    val t = new MergeTable(root, Seq("p"))
    t.overwrite(Seq((0, "seed", "p1")).toDF("k", "v", "p"))
    val batch = (1 to 2000).map(i => (i, s"v$i", s"p${i % 2 + 1}"))
      .toDF("k", "v", "p").repartition(16)
    t.append(batch)
    assert(filesPerDir(t).values.sum > 8,
      "control: the un-optimized append should scatter small files")
  }

  test("autoCompact bin-packs only the touched partitions past minNumFiles") {
    val root = scratch("ac")
    val t = new MergeTable(root, Seq("p"))
    t.overwrite(Seq((0, "seed", "cold")).toDF("k", "v", "p"))
    t.setProperties(Map(
      MergeTable.AutoCompactProp -> "true",
      MergeTable.AutoCompactMinFilesProp -> "3"))
    // sliver appends: the hot partition crosses the threshold at appends
    // 3 and 5, compacting back to one file each time
    (1 to 5).foreach { i =>
      t.append(Seq((i, s"v$i", "hot")).toDF("k", "v", "p"))
    }
    val perDir = filesPerDir(t)
    assert(perDir("p=hot") === 1,
      s"hot partition must be compacted, got $perDir")
    assert(perDir("p=cold") === 1, "cold partition untouched")
    // content survives the compactions verbatim
    assert(t.read(spark).select("k").as[Int].collect().sorted.toSeq ===
      (0 to 5).toSeq)
    // the compactions are real OPTIMIZE commits in the history
    assert(t.history(spark).select("operation").as[String].collect()
      .count(_.startsWith("OPTIMIZE")) >= 1)
  }

  test("unpartitioned autoCompact packs the whole table at the threshold") {
    val root = scratch("ac_flat")
    val t = new MergeTable(root)
    t.overwrite(Seq((0, "seed")).toDF("k", "v"))
    t.setProperties(Map(
      MergeTable.AutoCompactProp -> "true",
      MergeTable.AutoCompactMinFilesProp -> "4"))
    (1 to 4).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    assert(t.filesOf(t.currentVersion).size <= 2,
      s"expected a packed table, got ${t.filesOf(t.currentVersion)}")
    assert(t.read(spark).count() === 5L)
  }
}
