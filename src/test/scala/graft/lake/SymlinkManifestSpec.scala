package graft.lake

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GENERATE symlink_format_manifest — the external-engine (Presto/Trino/
  * Athena) compatibility surface: per-partition manifest files listing the
  * current snapshot's data files as absolute paths.
  */
class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  private def manifestsOf(root: String): Map[String, Seq[String]] = {
    val mroot = Paths.get(root, MergeTable.SymlinkManifestDir)
    Files.walk(mroot).iterator().asScala
      .filter(p => p.getFileName.toString == "manifest")
      .map(p => mroot.relativize(p.getParent).toString ->
        Files.readAllLines(p).asScala.toSeq)
      .toMap
  }

  test("manifests list exactly the snapshot; stale partitions vanish on regenerate") {
    val root = scratch("symlink")
    val t = new MergeTable(root, Seq("p"))
    t.overwrite(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "p"))
    t.generateSymlinkManifest()
    val m1 = manifestsOf(root)
    assert(m1.keySet === Set("p=a", "p=b", "p=c"))
    val base = Paths.get(root).toAbsolutePath.normalize
    assert(m1.values.flatten.toSet ===
      t.filesOf(t.currentVersion).map(f => base.resolve(f).toString).toSet)
    // partition c disappears: its manifest dir must vanish, not go stale
    t.delete(spark, col("p") === "c")
    t.generateSymlinkManifest()
    assert(manifestsOf(root).keySet === Set("p=a", "p=b"))
  }

  test("the property keeps manifests in lockstep with commits") {
    val root = scratch("symlink_auto")
    val t = new MergeTable(root, Seq("p"))
    t.overwrite(Seq((1, "a")).toDF("k", "p"))
    t.setProperties(Map(MergeTable.SymlinkManifestProp -> "true"))
    assert(manifestsOf(root).keySet === Set("p=a"),
      "the enabling commit itself generates — the manifest is never behind")
    t.append(Seq((2, "b")).toDF("k", "p"))
    assert(manifestsOf(root).keySet === Set("p=a", "p=b"))
    t.delete(spark, col("p") === "a")
    assert(manifestsOf(root).keySet === Set("p=b"))
  }

  test("refuses externally-unreadable snapshots: deletion vectors and column mapping") {
    val root = scratch("symlink_dv")
    val t = new MergeTable(root, Nil)
    t.overwrite(spark.range(10).select(col("id").as("k")))
    t.deleteVectorized(spark, col("k") === 3)
    val ex = intercept[IllegalArgumentException](t.generateSymlinkManifest())
    assert(ex.getMessage.contains("deletion vectors"))

    val root2 = scratch("symlink_cm")
    val t2 = new MergeTable(root2, Nil)
    t2.overwrite(spark.range(5).select(col("id").as("k"), col("id").as("x")))
    t2.renameColumn("k", "kk")
    val ex2 = intercept[IllegalArgumentException](t2.generateSymlinkManifest())
    assert(ex2.getMessage.contains("column mapping"))
  }

  test("an unpartitioned table writes one root manifest") {
    val root = scratch("symlink_flat")
    val t = new MergeTable(root, Nil)
    t.overwrite(spark.range(4).select(col("id").as("k")))
    t.generateSymlinkManifest()
    val m = manifestsOf(root)
    assert(m.keySet === Set(""))
    // the external read over the listed files equals the logical table
    val ext = spark.read.parquet(m("") : _*)
    assert(ext.agg(sum("k")).head.getLong(0) === 6L)
  }
}
