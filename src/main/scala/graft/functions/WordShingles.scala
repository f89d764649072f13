package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — distinct n-word shingles of a
  * space-separated text, as a native expression. Replaces the interpreted
  * higher-order idiom
  * `array_distinct(transform(sequence(1, size(words)-n+1), i ->
  * concat_ws(' ', element_at(words,i), ...)))`, which evaluates one lambda
  * invocation per shingle per element — profiled at ~75% of the d3 Jaccard
  * runtime. Semantics are IDENTICAL: the split keeps empty tokens exactly
  * like `split(text, ' ')` (regex, limit -1), shingles join with a single
  * space, and distinct keeps first occurrence — so the DuckDB oracle is
  * unchanged.
  *
  * Fewer than `n` words ⇒ empty array (callers filter `size > 0`, which is
  * exactly the old `size(words) >= n` gate).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Static so generated code calls straight into one compiled method. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // split(" ", -1): single-space regex, empty tokens (incl. trailing) kept
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
