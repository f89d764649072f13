package graft.sqlapi

import graft.SparkSpec
import graft.lake.MergeTable

/** MergeInto statement surface: accepted shapes, loud rejections, and
  * end-to-end execution against a MergeTable.
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  test("parses AS-aliases, bare aliases, defaults, multi-key, any case") {
    val st = MergeInto.parse(
      "MERGE INTO tgt AS t USING src AS s ON t.k = s.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(st == MergeInto.Statement("tgt", "t", "src", "s", Seq("k"),
      Seq(MergeTable.MatchedUpdate(), MergeTable.NotMatchedInsert())))
    assert(st.isSimpleUpsert)

    val bare = MergeInto.parse(
      "merge into tgt t using src s on t.a = s.a and s.b = t.b when matched then update set * when not matched then insert *;")
    assert(bare.keys == Seq("a", "b"), "reversed-side equality must still key correctly")

    // no aliases: table names are the aliases
    val plain = MergeInto.parse(
      """MERGE INTO tgt USING src
        |ON tgt.k = src.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(plain.keys == Seq("k") && plain.targetAlias == "tgt")
  }

  test("rejects unsupported shapes with pointed messages") {
    def msg(sql: String): String =
      intercept[IllegalArgumentException](MergeInto.parse(sql)).getMessage
    assert(msg("MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPSERT ALL")
      .contains("unsupported MERGE clause"))
    assert(msg("MERGE INTO t USING s ON t.k = s.k WHEN NOT MATCHED THEN " +
        "INSERT (a, b) VALUES (1)")
      .contains("count mismatch"))
    assert(msg("MERGE INTO t USING s ON t.k < s.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .contains("unsupported ON term"))
    assert(msg("MERGE INTO t USING s ON t.k = s.other WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .contains("different columns"))
    assert(msg("MERGE INTO t AS x USING s AS x ON x.k = x.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .contains("collide"))
  }

  test("run: unknown target is a loud error; known target merges end-to-end") {
    val t = new MergeTable(scratch("mi_run"), Seq("p"))
    t.overwrite(Seq((1, "a", "p1"), (2, "b", "p2")).toDF("k", "v", "p"))
    Seq((2, "B", "p2"), (3, "c", "p1")).toDF("k", "v", "p")
      .createOrReplaceTempView("mi_src")

    val ex = intercept[IllegalArgumentException] {
      MergeInto.run(spark,
        "MERGE INTO nope AS t USING mi_src AS s ON t.k = s.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        Map("lake" -> t))
    }
    assert(ex.getMessage.contains("unknown MERGE target"))

    MergeInto.run(spark,
      "MERGE INTO lake AS t USING mi_src AS s ON t.k = s.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      Map("lake" -> t))
    val got = t.read(spark).select("k", "v", "p").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a", "p1"), (2, "B", "p2"), (3, "c", "p1")))
  }

  test("parses the full conditional-clause grammar") {
    val st = MergeInto.parse(
      """MERGE INTO tgt AS t USING src AS s ON t.k = s.k
        |WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v, note = 'bumped'
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.v > 0 THEN INSERT (k, v) VALUES (s.k, s.v + 1)
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.v < 0 THEN DELETE""".stripMargin)
    assert(!st.isSimpleUpsert)
    assert(st.clauses === Seq(
      MergeTable.MatchedUpdate(Some("s.v > t.v"),
        Seq("v" -> "s.v", "note" -> "'bumped'")),
      MergeTable.MatchedDelete(None),
      MergeTable.NotMatchedInsert(Some("s.v > 0"),
        Seq("k" -> "s.k", "v" -> "s.v + 1")),
      MergeTable.NotMatchedInsert(None, Nil),
      MergeTable.BySourceDelete(Some("t.v < 0"))))
    // a CASE WHEN inside an assignment must not split the clause list
    val cw = MergeInto.parse(
      "MERGE INTO tgt AS t USING src AS s ON t.k = s.k WHEN MATCHED THEN " +
        "UPDATE SET v = CASE WHEN s.v > 0 THEN s.v ELSE t.v END")
    assert(cw.clauses === Seq(MergeTable.MatchedUpdate(None,
      Seq("v" -> "CASE WHEN s.v > 0 THEN s.v ELSE t.v END"))))
    // qualified SET targets strip the target alias; source-alias targets fail
    val q = MergeInto.parse(
      "MERGE INTO tgt AS t USING src AS s ON t.k = s.k WHEN MATCHED THEN UPDATE SET t.v = s.v")
    assert(q.clauses === Seq(MergeTable.MatchedUpdate(None, Seq("v" -> "s.v"))))
    val ex = intercept[IllegalArgumentException](MergeInto.parse(
      "MERGE INTO tgt AS t USING src AS s ON t.k = s.k WHEN MATCHED THEN UPDATE SET s.v = 1"))
    assert(ex.getMessage.contains("must be a target column"))
  }

  test("conditional clauses execute end-to-end through run()") {
    val t = new MergeTable(scratch("mi_cond"), Seq("p"))
    t.overwrite(Seq((1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2"), (4, 40, "p2"))
      .toDF("k", "v", "p"))
    // source: k=2 (lower v → matched, no clause claims → unchanged),
    // k=3 (higher v → conditional update), k=4 (equal v → second matched
    // clause deletes), k=5 (insert via column list), k=6 (insert *)
    Seq((2, 5, "p1"), (3, 300, "p2"), (4, 40, "p2"), (5, 50, "p1"), (6, -1, "p2"))
      .toDF("k", "v", "p").createOrReplaceTempView("mi_cond_src")
    MergeInto.run(spark,
      """MERGE INTO lake AS t USING mi_cond_src AS s ON t.k = s.k
        |WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v * 2
        |WHEN MATCHED AND s.v = t.v THEN DELETE
        |WHEN NOT MATCHED AND s.v > 0 THEN INSERT (k, v, p) VALUES (s.k, s.v + 1, s.p)
        |WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN UPDATE SET v = 0""".stripMargin,
      Map("lake" -> t))
    val got = t.read(spark).select("k", "v").as[(Int, Int)].collect().toSet
    // k=1: by-source update → 0; k=2: unchanged (no matched clause true);
    // k=3: 600; k=4: deleted; k=5: 51 inserted; k=6: dropped (v <= 0)
    assert(got === Set((1, 0), (2, 20), (3, 600), (5, 51)))
  }

  test("MERGE WITH SCHEMA EVOLUTION evolves the target schema on the upsert shape") {
    val st = MergeInto.parse(
      "MERGE WITH SCHEMA EVOLUTION INTO tgt USING src ON tgt.k = src.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(st.schemaEvolution && st.isSimpleUpsert)
    assert(!MergeInto.parse(
      "MERGE INTO tgt USING src ON tgt.k = src.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *").schemaEvolution)

    val t = new MergeTable(scratch("mi_evo"), Seq("p"))
    t.overwrite(Seq((1, "a", "p1"), (2, "b", "p1")).toDF("k", "v", "p"))
    Seq((2, "B", "p1", 9), (3, "c", "p2", 7)).toDF("k", "v", "p", "extra")
      .createOrReplaceTempView("mi_evo_src")
    MergeInto.run(spark,
      "MERGE WITH SCHEMA EVOLUTION INTO lake USING mi_evo_src ON lake.k = mi_evo_src.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      Map("lake" -> t))
    val out = t.read(spark).select("k", "v", "extra").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.get(2)))).toSet
    assert(out === Set((1, "a", None), (2, "B", Some(9)), (3, "c", Some(7))))
    // conditional clauses evolve too (mergeClausesEvolve): a source column
    // the target lacks appears, conditional dispatch still applies
    Seq((2, "B2", "p1", 1), (9, "i", "p2", 2)).toDF("k", "v", "p", "extra2")
      .createOrReplaceTempView("mi_evo_src2")
    MergeInto.run(spark,
      "MERGE WITH SCHEMA EVOLUTION INTO lake USING mi_evo_src2 ON lake.k = mi_evo_src2.k " +
        "WHEN MATCHED AND mi_evo_src2.extra2 > 0 THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *",
      Map("lake" -> t))
    val out2 = t.read(spark).select("k", "v", "extra2").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.get(2)))).toSet
    assert(out2 === Set((1, "a", None), (2, "B2", Some(1)), (3, "c", None),
      (9, "i", Some(2))))
  }
}
