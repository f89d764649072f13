package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Column mapping ([[MergeTable.renameColumn]]/[[MergeTable.dropColumn]]):
  * metadata-only rename/drop, physical-name stability across rewrites,
  * no-resurrection on re-add, stats re-keying, guards, and the
  * restore/clone/dv interplay.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Int, String, String)]): DataFrame =
    rows.toDF("k", "v", "p")

  private val base = Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"))

  test("rename is metadata-only and preserves values under the new name") {
    val t = new MergeTable(scratch("cm_rename"), Seq("p"))
    t.overwrite(df(base))
    val v0Files = t.filesOf(0)
    t.renameColumn("v", "label")
    assert(t.filesOf(1) === v0Files, "rename must not rewrite any data file")
    assert(t.columnMapping === Map("label" -> "v"))
    assert(t.read(spark).columns.toSeq === Seq("k", "label", "p"))
    assert(t.read(spark).select("k", "label").as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))
    // time travel: the old version still speaks the old name
    assert(t.readVersion(spark, 0).columns.toSeq === Seq("k", "v", "p"))
  }

  test("writes after a rename store the PHYSICAL name; reads stay logical") {
    val t = new MergeTable(scratch("cm_write"), Seq("p"))
    t.overwrite(df(base))
    t.renameColumn("v", "label")
    t.merge(spark, Seq((2, "B", "p1"), (9, "z", "p3")).toDF("k", "label", "p"), Seq("k"))
    assert(t.read(spark).select("k", "label").as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "B"), (3, "c"), (9, "z")))
    // the new files physically store "v": a raw parquet read of the merge's
    // data dir must see the original physical column, not "label"
    val newDirs = t.filesOf(2).filterNot(t.filesOf(0).contains).map(_.takeWhile(_ != '/')).distinct
    assert(newDirs.nonEmpty)
    val raw = spark.read.parquet(newDirs.map(d => s"${t.root}/$d"): _*)
    assert(raw.columns.contains("v") && !raw.columns.contains("label"))
  }

  test("rename chain back to the original name restores identity mapping") {
    val t = new MergeTable(scratch("cm_chain"), Seq("p"))
    t.overwrite(df(base))
    t.renameColumn("v", "label")
    t.renameColumn("label", "v")
    assert(t.columnMapping === Map.empty)
    assert(t.read(spark).select("k", "v").as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("drop + re-add never resurrects dropped data") {
    val t = new MergeTable(scratch("cm_dropadd"), Seq("p"))
    t.overwrite(df(base))
    t.dropColumn("v")
    assert(t.read(spark).columns.toSeq === Seq("k", "p"))
    t.addColumns(StructType(Seq(StructField("v", StringType))))
    // the re-added v has a FRESH physical name — old files' v bytes stay dead
    assert(t.columnMapping.get("v").exists(_ != "v"))
    assert(t.read(spark).select("v").as[String].collect().forall(_ == null),
      "dropped column data resurrected through a re-added name")
    // time travel still shows the original values
    assert(t.readVersion(spark, 0).select("v").as[String].collect().toSet === Set("a", "b", "c"))
  }

  test("file stats re-key on rename; range reads keep pruning") {
    val t = new MergeTable(scratch("cm_stats"), Seq("p"), statsCols = Seq("k"))
    t.overwrite(df(base))
    t.renameColumn("k", "id")
    assert(t.statsOf(t.currentVersion).values.flatMap(_.keys).toSet === Set("id"))
    val pruned = t.candidateFiles("id", 1, 1)
    assert(pruned.nonEmpty && pruned.size < t.filesOf(t.currentVersion).size,
      "stats-based pruning lost across rename")
    assert(t.readRange(spark, "id", 1, 1).select("id").as[Int].collect().toSeq === Seq(1))
  }

  test("guards: partition / referenced / last column") {
    val t = new MergeTable(scratch("cm_guards"), Seq("p"))
    t.overwrite(df(base))
    intercept[IllegalArgumentException](t.renameColumn("p", "q"))
    intercept[IllegalArgumentException](t.dropColumn("p"))
    t.addCheckConstraint(spark, "k_pos", "k > 0")
    intercept[IllegalArgumentException](t.renameColumn("k", "id"))
    intercept[IllegalArgumentException](t.dropColumn("k"))
    t.dropCheckConstraint("k_pos")
    t.renameColumn("k", "id") // now allowed
    val single = new MergeTable(scratch("cm_single"))
    single.overwrite(Seq(1, 2).toDF("x"))
    intercept[IllegalArgumentException](single.dropColumn("x"))
  }

  test("merge(mergeSchema) refuses a new column shadowing a retired physical") {
    val t = new MergeTable(scratch("cm_evoguard"), Seq("p"))
    t.overwrite(df(base))
    t.dropColumn("v")
    val ex = intercept[IllegalArgumentException] {
      t.merge(spark, Seq((9, "z", "p1")).toDF("k", "v", "p"), Seq("k"), mergeSchema = true)
    }
    assert(ex.getMessage.contains("addColumns"))
    // the sanctioned path: addColumns mints a fresh physical, then merge works
    t.addColumns(StructType(Seq(StructField("v", StringType))))
    t.merge(spark, Seq((9, "z", "p1")).toDF("k", "v", "p"), Seq("k"))
    val got = t.read(spark).select("k", "v").as[(Int, String)].collect().toMap
    assert(got(9) === "z" && got(1) === null)
  }

  test("restore across a rename revives that version's own mapping") {
    val t = new MergeTable(scratch("cm_restore"), Seq("p"))
    t.overwrite(df(base))         // v0: k,v,p
    t.renameColumn("v", "label")  // v1
    t.restore(0)                  // v2 = v0 state
    assert(t.read(spark).columns.toSeq === Seq("k", "v", "p"))
    assert(t.columnMapping === Map.empty)
    t.restore(1)                  // v3 = renamed state
    assert(t.read(spark).columns.toSeq === Seq("k", "label", "p"))
    assert(t.columnMapping === Map("label" -> "v"))
    assert(t.read(spark).select("label").as[String].collect().toSet === Set("a", "b", "c"))
  }

  test("clone carries the mapping; dv masks survive a rename") {
    val t = new MergeTable(scratch("cm_clone_src"), Seq("p"))
    t.overwrite(df(base))
    t.deleteVectorized(spark, col("v") === "a")
    t.renameColumn("v", "label")
    assert(t.read(spark).count() === 2, "dv mask lost after rename")
    val c = t.cloneTo(scratch("cm_clone_dst") + "/t")
    assert(c.columnMapping === Map("label" -> "v"))
    assert(c.read(spark).select("k", "label").as[(Int, String)].collect().toSet ===
      Set((2, "b"), (3, "c")))
  }

  test("ALTER TABLE statements route through LakeSql and spark.sql") {
    import graft.sqlapi.{LakeCatalog, LakeSql}
    val t = new MergeTable(scratch("cm_sql"), Seq("p"))
    t.overwrite(df(base))
    LakeSql.run(spark, "ALTER TABLE tbl RENAME COLUMN v TO label", Map("tbl" -> t))
    assert(t.read(spark).columns.contains("label"))
    LakeSql.run(spark, "ALTER TABLE tbl ADD COLUMNS (score INT, note STRING)", Map("tbl" -> t))
    assert(t.read(spark).columns.toSeq === Seq("k", "label", "p", "score", "note"))
    LakeSql.run(spark, "ALTER TABLE tbl DROP COLUMN note", Map("tbl" -> t))
    assert(!t.read(spark).columns.contains("note"))
    // and through the injected parser
    LakeCatalog.register("cm_sql_tbl", t)
    try {
      spark.sql("ALTER TABLE cm_sql_tbl RENAME COLUMN label TO v")
      assert(t.read(spark).columns.toSeq === Seq("k", "v", "p", "score"))
    } finally LakeCatalog.unregister("cm_sql_tbl")
  }

  test("update and delete keep working on a renamed column") {
    val t = new MergeTable(scratch("cm_dml"), Seq("p"))
    t.overwrite(df(base))
    t.renameColumn("v", "label")
    t.update(spark, col("label") === "a", Map("label" -> lit("A")))
    t.delete(spark, col("label") === "b")
    assert(t.read(spark).select("k", "label").as[(Int, String)].collect().toSet ===
      Set((1, "A"), (3, "c")))
  }
}
