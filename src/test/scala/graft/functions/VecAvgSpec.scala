package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VecAvg (native vector-mean aggregate): value-identical to the
  * posexplode→avg declarative twin, NULL on empty input, length-mismatch
  * rejection, and partial-aggregation (serialize/merge) correctness across
  * partitions.
  */
class VecAvgSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf = Seq(
    ("a", Seq(1.0f, 2.0f, 3.0f)),
    ("a", Seq(3.0f, 4.0f, 5.0f)),
    ("b", Seq(10.0f, 20.0f, 30.0f)),
  ).toDF("k", "v")

  test("vec_avg equals the posexplode/avg twin") {
    GraftFunctions.register(spark)
    val native = vecDf.repartition(4) // force merge() across partial buffers
      .groupBy("k").agg(expr("vec_avg(v)").as("c"))
      .select(col("k"), posexplode(col("c")).as(Seq("dim", "c")))
    val twin = vecDf.select(col("k"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("k", "dim").agg(avg("x").as("c"))
    val n = native.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    val tw = twin.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(n === tw)
    assert(n === Set(
      ("a", 0, 2.0), ("a", 1, 3.0), ("a", 2, 4.0),
      ("b", 0, 10.0), ("b", 1, 20.0), ("b", 2, 30.0)))
  }

  test("NULL arrays are skipped; an all-NULL group yields NULL") {
    GraftFunctions.register(spark)
    val df = Seq(
      ("a", Some(Seq(2.0f, 4.0f))), ("a", None),
      ("b", None),
    ).toDF("k", "v")
    val got = df.groupBy("k").agg(expr("vec_avg(v)").as("c"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").isDefined)
    assert(got("b").isEmpty)
  }

  test("mismatched vector lengths are rejected") {
    GraftFunctions.register(spark)
    val df = Seq(("a", Seq(1.0f)), ("a", Seq(1.0f, 2.0f))).toDF("k", "v")
    val ex = intercept[Exception] {
      df.coalesce(1).groupBy("k").agg(expr("vec_avg(v)")).collect()
    }
    assert(ex.getMessage.contains("length mismatch") ||
      Option(ex.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("non-ARRAY<FLOAT> input is an analysis error") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT vec_avg(array(1.0D, 2.0D))").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>"), ex.getMessage)
  }
}
