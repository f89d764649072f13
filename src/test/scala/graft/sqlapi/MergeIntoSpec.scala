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
    assert(st == MergeInto.Statement("tgt", "t", "src", "s", Seq("k")))

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
    assert(msg("MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN DELETE")
      .contains("supported shape"))
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
}
