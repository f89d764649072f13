package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GraftExtensions: float_dot available via SQL in every session, and the
  * DotProductRewrite optimizer rule substitutes the higher-order idiom with
  * the codegen expression — with EXACT semantics (nulls, length mismatch).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"

  test("optimizer rewrites the zip_with/aggregate idiom to FloatDot") {
    // non-foldable input (built from range's id) so constant folding can't
    // collapse the expression before the rewrite is observable.
    val df = spark.range(1)
      .select(
        expr("CAST(array(CAST(id AS FLOAT) + 1.0, 2.0) AS ARRAY<FLOAT>)").as("a"),
        expr("CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)").as("b"))
      .select(expr(hof).as("dot"))
    val optimized = df.queryExecution.optimizedPlan
    val found = optimized.expressions.exists(_.exists(_.isInstanceOf[FloatDot]))
    assert(found, s"expected FloatDot in optimized plan:\n$optimized")
    assert(df.collect().head.getDouble(0) === 11.0) // 1*3 + 2*4
  }

  test("rewrite preserves the idiom's null semantics exactly") {
    val df = Seq(
      ("equal", Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](3.0f, 4.0f)),
      ("shorter", Seq[java.lang.Float](1.0f), Seq[java.lang.Float](3.0f, 4.0f)),
      ("null_elem", Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](3.0f, 4.0f)),
    ).toDF("case", "a", "b")
    val out = df.select(col("case"), expr(hof).as("dot"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("equal") === Some(11.0))
    assert(out("shorter") === None)   // zip_with pads ⇒ NULL
    assert(out("null_elem") === None) // NULL element ⇒ NULL
  }

  test("float_dot is SQL-callable without manual registration") {
    val r = spark.sql(
      "SELECT float_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(5.0, 7.0) AS ARRAY<FLOAT>))")
      .collect().head.getDouble(0)
    assert(r === 19.0)
  }

  test("rewrite refuses a product that is NOT the lambda's two distinct args") {
    // (x, y) -> CAST(x)*CAST(x) is a sum of squares of `a`; rewriting it to
    // FloatDot(a, b) = sum(a_i * b_i) would be silently wrong.
    val squares =
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    val df = spark.range(1)
      .select(
        expr("CAST(array(CAST(id AS FLOAT) + 1.0, 2.0) AS ARRAY<FLOAT>)").as("a"),
        expr("CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)").as("b"))
      .select(expr(squares).as("ss"))
    val optimized = df.queryExecution.optimizedPlan
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[FloatDot])),
      s"sum-of-squares must not be rewritten to FloatDot:\n$optimized")
    assert(df.collect().head.getDouble(0) === 5.0) // 1*1 + 2*2
  }

  test("float_dot rejects wrong arity and non-ARRAY<FLOAT> inputs at analysis") {
    val oneArg = intercept[Exception] {
      spark.sql("SELECT float_dot(CAST(array(1.0) AS ARRAY<FLOAT>))").collect()
    }
    assert(oneArg.getMessage.contains("2 arguments"), oneArg.getMessage)
    val wrongType = intercept[Exception] {
      spark.sql("SELECT float_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").collect()
    }
    assert(wrongType.getMessage.toLowerCase.contains("array<float>"), wrongType.getMessage)
  }
}
