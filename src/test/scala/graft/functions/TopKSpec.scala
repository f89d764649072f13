package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopK native aggregate: heap bounds, partial/merge path (forced through a
  * real shuffle), NULL skipping, k larger than the group, tie multisets,
  * serialization round trip.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("grouped top-k equals the window row_number formulation") {
    val df = (1 to 1000).map(i => (s"g${i % 7}", (i * 37 % 1000).toDouble))
      .toDF("g", "v").repartition(8) // >1 partition ⇒ partial buffers really merge
    val got = df.groupBy("g").agg(expr("top_k(v, 5)").as("tops"))
      .select(col("g"), explode(col("tops")).as("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val want = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.takeRight(5).toSeq).toMap
    assert(got === want)
  }

  test("descending order, NULL skipped, small groups, empty result") {
    val df = Seq(
      ("a", Some(3.0)), ("a", Some(1.0)), ("a", None), ("a", Some(2.0)),
      ("b", None)).toDF("g", "v")
    val rows = df.groupBy("g").agg(expr("top_k(v, 2)").as("tops"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(rows("a") === Seq(3.0, 2.0))
    assert(rows("b") === Seq.empty) // all-NULL group: empty array, not NULL
  }

  test("k beyond group size returns the whole group; ties keep multiset") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 1.0)).toDF("g", "v")
    val out = df.groupBy("g").agg(expr("top_k(v, 10)").as("tops"))
      .collect().head.getSeq[Double](1)
    assert(out === Seq(5.0, 5.0, 1.0))
  }

  test("buffer serialization round-trips through add order") {
    val agg = TopK(org.apache.spark.sql.catalyst.expressions.Literal(0.0), 3)
    val b = agg.createAggregationBuffer()
    Seq(5.0, 1.0, 9.0, 7.0, 3.0).foreach(b.add)
    val restored = agg.deserialize(agg.serialize(b))
    val c = agg.createAggregationBuffer()
    c.add(8.0)
    val merged = agg.merge(c, restored)
    assert(agg.eval(merged).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toDoubleArray().toSeq === Seq(9.0, 8.0, 7.0))
  }

  test("non-literal or non-positive k is an analysis-time error") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[Exception] { df.selectExpr("top_k(v, 0)").collect() }
    intercept[Exception] { df.selectExpr("top_k(v)").collect() }
  }
}
