package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** `WHEN NOT MATCHED BY SOURCE THEN DELETE`
  * ([[MergeTable.merge]]'s `deleteNotMatchedBySource`): full-sync
  * semantics, partition-scoped pruning, CDF delete rows, and the SQL
  * clause through [[graft.sqlapi.MergeInto]].
  */
class SyncMergeSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Int, String, String)]): DataFrame =
    rows.toDF("k", "v", "p")

  private val base = Seq(
    (1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p2"))

  test("unscoped sync makes the table exactly the source") {
    val t = new MergeTable(scratch("sync_full"), Seq("p"))
    t.overwrite(df(base))
    t.merge(spark, df(Seq((1, "A", "p1"), (9, "z", "p3"))), Seq("k"),
      deleteNotMatchedBySource = true)
    assert(t.read(spark).select("k", "v", "p").as[(Int, String, String)].collect().toSet ===
      Set((1, "A", "p1"), (9, "z", "p3")))
  }

  test("keysDeterminePartitions scopes the sync; other partitions carry forward") {
    val t = new MergeTable(scratch("sync_scoped"), Seq("p"))
    t.overwrite(df(base))
    val p2Files = t.filesOf(0).filter(_.contains("/p=p2/"))
    // sync ONLY partition p1: k=2 vanishes, k=1 updates, k=5 inserts; p2 untouched
    t.merge(spark, df(Seq((1, "A", "p1"), (5, "e", "p1"))), Seq("k"),
      keysDeterminePartitions = true, deleteNotMatchedBySource = true)
    assert(t.read(spark).select("k", "v", "p").as[(Int, String, String)].collect().toSet ===
      Set((1, "A", "p1"), (5, "e", "p1"), (3, "c", "p2"), (4, "d", "p2")))
    assert(p2Files.forall(t.filesOf(1).contains),
      "out-of-scope partition files must carry forward by reference")
  }

  test("sync records CDF delete rows for vanished target rows") {
    val t = new MergeTable(scratch("sync_cdf"), Seq("p"))
    t.overwrite(df(base))
    t.merge(spark, df(Seq((1, "A", "p1"))), Seq("k"),
      keysDeterminePartitions = true, deleteNotMatchedBySource = true,
      changeFeed = true)
    val ch = t.changes(spark, 1, 1)
    assert(ch.filter(col(MergeTable.ChangeType) === "delete")
      .select("k").as[Int].collect().toSet === Set(2))
    assert(ch.filter(col(MergeTable.ChangeType) === "update_postimage")
      .select("v").as[String].collect().toSeq === Seq("A"))
  }

  test("sync refuses mergeSchema; sync over dv masks never resurrects") {
    val t = new MergeTable(scratch("sync_guard"), Seq("p"))
    t.overwrite(df(base))
    intercept[IllegalArgumentException] {
      t.merge(spark, df(base), Seq("k"), mergeSchema = true,
        deleteNotMatchedBySource = true)
    }
    t.deleteVectorized(spark, col("k") === 3) // mask a p2 row
    t.merge(spark, df(Seq((1, "A", "p1"))), Seq("k"),
      keysDeterminePartitions = true, deleteNotMatchedBySource = true)
    assert(t.read(spark).select("k").as[Int].collect().toSet === Set(1, 4))
  }

  test("SQL: WHEN NOT MATCHED BY SOURCE THEN DELETE") {
    import graft.sqlapi.MergeInto
    val t = new MergeTable(scratch("sync_sql"), Seq("p"))
    t.overwrite(df(base))
    df(Seq((3, "C", "p2"), (7, "g", "p2"))).createOrReplaceTempView("sync_src")
    MergeInto.run(spark,
      """MERGE INTO tbl AS t USING sync_src AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin,
      Map("tbl" -> t))
    assert(t.read(spark).select("k", "v").as[(Int, String)].collect().toSet ===
      Set((3, "C"), (7, "g")))
    // the plain two-clause shape still parses as the non-sync fast path
    val plain = MergeInto.parse(
      "MERGE INTO a USING b ON a.k = b.k WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    assert(plain.isSimpleUpsert &&
      !plain.clauses.exists(_.isInstanceOf[MergeTable.BySourceDelete]))
  }
}
