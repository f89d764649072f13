package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Row tracking (`rowTracking = true`, Delta row-tracking analog): ids are
  * assigned once at first write from a commit-carried high-water mark,
  * hidden from default reads, surfaced by readWithRowIds, preserved
  * VERBATIM by every rewrite path (merge update, mergeClauses, UPDATE,
  * DELETE survivors, OPTIMIZE/ZORDER/REORG, replaceWhere survivors), and
  * fresh for every inserted/appended row — never reused, never duplicated.
  */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Int, String, String)]): DataFrame =
    rows.toDF("k", "v", "p")

  /** key → row id of the current snapshot (tables here key rows by k). */
  private def ids(t: MergeTable): Map[Int, Long] =
    t.readWithRowIds(spark).select("k", MergeTable.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("ids are hidden by default, unique, and dense from the hwm") {
    val t = new MergeTable(scratch("rt_basic"), Seq("p"), rowTracking = true)
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"))))
    assert(!t.read(spark).columns.contains(MergeTable.RowIdCol))
    assert(!t.schemaOf(0).fieldNames.contains(MergeTable.RowIdCol))
    val m = ids(t)
    assert(m.keySet === Set(1, 2, 3))
    assert(m.values.toSeq.distinct.size === 3)
    assert(m.values.toSet.subsetOf((0L until 3L).toSet), s"dense from 0: $m")
  }

  test("merge preserves surviving/updated ids; inserts get fresh ones") {
    val t = new MergeTable(scratch("rt_merge"), Seq("p"), rowTracking = true)
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"))))
    val before = ids(t)
    // 2 updated AND moved partition; 4 inserted; 1,3 kept
    t.merge(spark, df(Seq((2, "B", "p2"), (4, "d", "p3"))), Seq("k"))
    val after = ids(t)
    assert(after(1) === before(1) && after(3) === before(3), "kept rows keep ids")
    assert(after(2) === before(2), "updated row keeps its id across the partition move")
    assert(!before.values.toSet.contains(after(4)), "insert gets a fresh id")
    assert(after.values.toSeq.distinct.size === 4)
  }

  test("UPDATE / DELETE / OPTIMIZE / ZORDER never re-identify a row") {
    val t = new MergeTable(scratch("rt_rewrites"), Seq("p"),
      statsCols = Seq("k"), rowTracking = true)
    t.overwrite(df((1 to 20).map(k => (k, s"v$k", if (k % 2 == 0) "pe" else "po"))))
    val m0 = ids(t)
    t.update(spark, col("k") <= 5, Map("v" -> lit("U")))
    assert(ids(t) === m0, "UPDATE keeps every id")
    t.delete(spark, col("k") > 18)
    assert(ids(t) === m0.filter(_._1 <= 18), "DELETE keeps survivors' ids")
    t.compact(spark)
    assert(ids(t) === m0.filter(_._1 <= 18), "OPTIMIZE keeps ids")
    t.zorderCompact(spark, Seq("k"))
    assert(ids(t) === m0.filter(_._1 <= 18), "ZORDER keeps ids")
  }

  test("mergeClauses: update/delete claimed rows keep ids, inserts fresh") {
    import MergeTable.{MatchedDelete, MatchedUpdate, NotMatchedInsert}
    val t = new MergeTable(scratch("rt_clauses"), Seq("p"), rowTracking = true)
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"))))
    val before = ids(t)
    t.mergeClauses(spark, df(Seq((1, "A", "p1"), (3, "x", "p2"), (9, "i", "p3"))),
      Seq("k"), Seq(
        MatchedUpdate(Some("s.v = 'A'"), Seq("v" -> "s.v")),
        MatchedDelete(None),
        NotMatchedInsert(None, Nil)))
    val after = ids(t)
    assert(after.keySet === Set(1, 2, 9))
    assert(after(1) === before(1), "clause-updated row keeps its id")
    assert(after(2) === before(2), "unclaimed row keeps its id")
    assert(!before.values.toSet.contains(after(9)), "insert id is fresh")
  }

  test("dv delete + REORG PURGE and replaceWhere keep survivor ids") {
    val t = new MergeTable(scratch("rt_dv"), Seq("p"), rowTracking = true)
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p2"))))
    val before = ids(t)
    t.deleteVectorized(spark, col("k") === 3)
    assert(ids(t) === before - 3, "dv mask drops the row, ids untouched")
    t.reorgPurge(spark)
    assert(ids(t) === before - 3, "purge rewrite keeps survivor ids")
    t.overwriteWhere(spark, col("p") === "p1", df(Seq((7, "z", "p1"))))
    val after = ids(t)
    assert(after.keySet === Set(4, 7))
    assert(after(4) === before(4), "out-of-slice survivor keeps its id")
    assert(!before.values.toSet.contains(after(7)), "replacement rows are fresh")
  }

  test("append and clone: fresh ids never collide; clone preserves ids") {
    val t = new MergeTable(scratch("rt_append"), Seq("p"), rowTracking = true)
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p1"))))
    t.append(df(Seq((3, "c", "p2"))))
    val m = ids(t)
    assert(m.values.toSeq.distinct.size === 3)
    val clone = t.cloneTo(scratch("rt_clone"))
    assert(ids(clone) === m, "zero-copy clone sees the same ids")
    clone.append(df(Seq((4, "d", "p2"))))
    val cm = ids(clone)
    assert(cm(4) > m.values.max, "clone's hwm continues past the source's")
    assert(ids(t) === m, "the source is untouched")
  }

  test("property: random op sequences never re-identify, reuse, or collide ids") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.listOfN(6, Gen.chooseNum(0, 24)).map(_.distinct)
    val params = Gen.Parameters.default
    (0 until 3).foreach { trial =>
      val t = new MergeTable(scratch(s"rt_prop_$trial"), Seq("p"), rowTracking = true)
      t.overwrite(df((0 to 24).map(k => (k, s"v$k", if (k % 2 == 0) "pe" else "po"))))
      var prev = ids(t)
      var everAssigned = prev.values.toSet
      (0 until 4).foreach { step =>
        val ks = keyGen.apply(params, Seed(trial * 100L + step)).get
        step % 4 match {
          case 0 => t.merge(spark, // update ks, insert shifted keys
            df(ks.map(k => (k, s"m$k", "pe")) ++ ks.map(k => (k + 1000 * (step + 1), "i", "po"))),
            Seq("k"))
          case 1 => t.delete(spark, col("k").isin(ks.map(Int.box): _*))
          case 2 => t.update(spark, col("k").isin(ks.map(Int.box): _*),
            Map("v" -> lit(s"u$step")))
          case 3 => t.compact(spark)
        }
        val cur = ids(t)
        // ids are globally unique within the snapshot
        assert(cur.values.toSeq.distinct.size === cur.size, s"trial $trial step $step")
        // every row that survived the op kept its id
        prev.foreach { case (k, id) =>
          cur.get(k).foreach(nid => assert(nid === id,
            s"trial $trial step $step: row $k re-identified $id → $nid"))
        }
        // fresh rows never reuse ANY previously assigned id
        val freshIds = cur.filterNot { case (k, _) => prev.contains(k) }.values
        freshIds.foreach(id => assert(!everAssigned.contains(id),
          s"trial $trial step $step: id $id reused"))
        everAssigned ++= cur.values
        prev = cur
      }
    }
  }

  test("a non-tracking table rejects the reserved column and readWithRowIds") {
    val t = new MergeTable(scratch("rt_off"), Seq("p"))
    intercept[IllegalArgumentException] {
      t.overwrite(df(Seq((1, "a", "p1")))
        .withColumn(MergeTable.RowIdCol, lit(9L)))
    }
    t.overwrite(df(Seq((1, "a", "p1"))))
    intercept[IllegalArgumentException](t.readWithRowIds(spark))
  }

  test("row tracking is a persisted table property: flagless handles keep it in force") {
    val root = scratch("rt_persist")
    val t1 = new MergeTable(root, Seq("p"), rowTracking = true)
    t1.overwrite(df(Seq((1, "a", "p1"))))
    assert(t1.properties.get(MergeTable.RowTrackingProp).contains("true"))
    // reopened WITHOUT the constructor flag: the log keeps tracking on —
    // this handle's writes must still mint ids, or later tracked readers
    // would see NULLs and uniqueness would degrade silently
    val t2 = new MergeTable(root, Seq("p"))
    assert(t2.rowTrackingEnabled)
    t2.append(df(Seq((2, "b", "p1"))))
    val out = t2.readWithRowIds(spark)
    assert(out.filter(col(MergeTable.RowIdCol).isNull).count() === 0L)
    val allIds = out.select(MergeTable.RowIdCol).collect().map(_.getLong(0))
    assert(allIds.length === 2 && allIds.distinct.length === 2)
  }

  test("merge id inheritance never fans out on duplicate target keys") {
    val t = new MergeTable(scratch("rt_dupkeys"), Seq("p"), rowTracking = true)
    t.overwrite(df(Seq((1, "a", "p1"), (2, "b", "p1"))))
    t.append(df(Seq((1, "a2", "p1")))) // key 1 now DUPLICATED in the target
    t.merge(spark, df(Seq((1, "A", "p1"))), Seq("k"))
    // same row count as rowTracking = false semantics: both duplicate
    // target rows are replaced by exactly ONE source row (a fan-out join
    // on the (keys, id) frame would produce two)
    val rows = t.readWithRowIds(spark).select("k", MergeTable.RowIdCol)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.count(_._1 == 1) === 1, s"expected one row for key 1, got $rows")
    assert(rows.map(_._2).distinct.length === rows.length,
      "row ids must stay globally unique")
  }
}
