package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GENERATED ALWAYS AS IDENTITY over MergeTable: gap-free start/step
  * assignment, high-water-mark continuation, the ALWAYS contract, rewrite
  * preservation, and RESTORE rollback of the mark.
  */
class IdentitySpec extends SparkSpec {
  import spark.implicits._

  private def table(name: String, start: Long = 1L, step: Long = 1L) =
    new MergeTable(scratch(name), Nil,
      identityCol = Some(("id", start, step)))

  test("gap-free ids across partitions; hwm continues across appends") {
    val t = table("id_basic", start = 10L, step = 3L)
    t.overwrite(spark.range(0, 100, 1, 7).toDF("k")) // 7 partitions
    val ids0 = t.read(spark).select("id").as[Long].collect().sorted
    assert(ids0.toSeq === (0 until 100).map(i => 10L + 3L * i))
    t.append(spark.range(100, 150, 1, 3).toDF("k"))
    val ids1 = t.read(spark).select("id").as[Long].collect().sorted
    assert(ids1.toSeq === (0 until 150).map(i => 10L + 3L * i))
    assert(t.properties(MergeTable.IdentityHwmProp) === (10L + 3L * 149).toString)
    // ids pair 1:1 with rows (no duplicate, no loss)
    assert(t.read(spark).select("id").distinct().count() === 150L)
  }

  test("ALWAYS contract: explicit values are refused; merge is refused") {
    val t = table("id_always")
    t.overwrite(spark.range(0, 5).toDF("k"))
    val ex = intercept[IllegalArgumentException] {
      t.append(Seq((99L, 99L)).toDF("k", "id"))
    }
    assert(ex.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    val mx = intercept[IllegalArgumentException] {
      t.merge(spark, Seq(1L).toDF("k"), Seq("k"))
    }
    assert(mx.getMessage.contains("identity column"))
  }

  test("OPTIMIZE preserves ids verbatim; RESTORE rolls the mark back") {
    val t = table("id_opt")
    t.overwrite(spark.range(0, 20, 1, 4).toDF("k"))   // v0: ids 1..20
    t.append(spark.range(20, 30).toDF("k"))           // v1: ids 21..30
    val before = t.read(spark).select("k", "id").as[(Long, Long)].collect().toSet
    t.compact(spark)                                       // v2: rewrite, no re-assign
    assert(t.read(spark).select("k", "id").as[(Long, Long)].collect().toSet === before)
    t.restore(0)                                      // v3: back to ids 1..20
    assert(t.properties(MergeTable.IdentityHwmProp) === "20")
    t.append(spark.range(100, 105).toDF("k"))         // continues from 20
    val ids = t.read(spark).select("id").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 25L))
  }
}
