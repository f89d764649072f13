package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `float_dot(a, b)` — dot product of two FLOAT arrays in DOUBLE, as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Replaces the `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)` higher-order
  * formulation used previously: semantically identical (same ascending-index
  * left-fold, so bit-for-bit equal results against the DuckDB oracle), but
  * ~10-50× faster — higher-order functions allocate an intermediate array
  * and evaluate a lambda per element, while this compiles to a tight
  * primitive loop inside the generated code. On the 100 TB path this is the
  * difference between similarity search being compute-bound on FMAs vs on
  * allocation.
  *
  * Null handling matches the higher-order form EXACTLY (required for the
  * DotProductRewrite optimizer rule to be a sound substitution): NULL if
  * either array is NULL, if the lengths differ (zip_with pads the shorter
  * side with NULL ⇒ NULL product ⇒ NULL sum), or if any element is NULL.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs MUST be ARRAY<FLOAT>; `AbstractDataType` needed for
  // ExpectsInputTypes is private[sql], so enforce via checkInputDataTypes —
  // otherwise e.g. array<double> would reach getFloat and read garbage slots.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // unequal lengths ⇒ NULL even on non-null inputs
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Session-level registration so `expr("float_dot(...)")` and SQL can use
  * the function (the SparkSessionExtensions-style injection point, applied
  * directly to the session's FunctionRegistry; idempotent).
  */
object GraftFunctions {
  /** Arity-checked builder shared by every registration point: SQL
    * `float_dot(a)` must be an AnalysisException, not an
    * IndexOutOfBoundsException from children(1).
    */
  def build(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"float_dot requires exactly 2 arguments, got ${children.length}")
    FloatDot(children(0), children(1))
  }

  /** `top_k(value, k)` builder: k must be a positive literal integer —
    * aggregate buffers are sized at plan time, not per row.
    */
  def buildTopK(children: Seq[Expression]): Expression = children match {
    case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) if k > 0 =>
      TopK(c, k)
    case _ => throw new IllegalArgumentException(
      "top_k(value, k) requires a positive literal integer k")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      build _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopK].getName, "top_k"),
      buildTopK _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cdc_bounds"),
      new ExpressionInfo(classOf[CdcBounds].getName, "cdc_bounds"),
      (children: Seq[Expression]) => children match {
        case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _),
                 org.apache.spark.sql.catalyst.expressions.Literal(m: Int, _)) =>
          CdcBounds(c, w, m)
        case _ => throw new IllegalArgumentException(
          "cdc_bounds(text, window, modulus) requires literal integer window and modulus")
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => children match {
        case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(
            b64: org.apache.spark.unsafe.types.UTF8String, _)) =>
          BloomContains.fromSqlLiteral(c, b64.toString)
        case _ => throw new IllegalArgumentException(
          "bloom_might_contain(col, sketch) requires a literal base64 sketch string")
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_avg"),
      new ExpressionInfo(classOf[VecAvg].getName, "vec_avg"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"vec_avg requires exactly 1 argument, got ${children.length}")
        VecAvg(children.head)
      })
  }
}
