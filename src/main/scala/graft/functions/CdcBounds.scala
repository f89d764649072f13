package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_bounds(text, window, modulus)` — content-defined chunk boundaries
  * of a space-separated text, as a native expression: 1-based positions
  * `i` (window ≤ i ≤ n) where the md5 of the `window`-word shingle ending
  * at `i` hits `hash % modulus == 0`, bracketed by 0 and n. One compiled
  * pass per document.
  *
  * Replaces the interpreted higher-order idiom
  * `filter(sequence(w, n), i -> conv(substring(md5(concat_ws(' ',
  * slice(words, i-w+1, w))), 1, 15), 16, 10) % m = 0)`, which pays a
  * per-position interpreted lambda (slice allocation, concat, hex parse)
  * and — worse — gets DUPLICATED by projection collapse into every
  * consumer of the bounds column (profiled: t23/t24 at 19 s each on sf0.1
  * vs 0.3 s for DuckDB's equivalent pass; this expression removes both the
  * interpretation overhead and the re-evaluation).
  *
  * Cross-engine contract (the t23/t24 oracles depend on it): the hash
  * value equals the first 15 hex chars of the md5 digest read as a base-16
  * integer — numerically `bytes[0..6]` big-endian, shifted left 4, OR'd
  * with the high nibble of `bytes[7]` (60 bits, always non-negative) —
  * exactly `conv(substring(md5_hex, 1, 15), 16, 10)` in Spark SQL and
  * `('0x' || substring(md5(s), 1, 15))::BIGINT` in DuckDB.
  */
case class CdcBounds(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {
  require(window >= 1, "cdc_bounds window must be >= 1")
  require(modulus >= 2, "cdc_bounds modulus must be >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override def nullSafeEval(input: Any): Any =
    CdcBounds.compute(input.asInstanceOf[UTF8String], window, modulus)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcBounds.compute($c, $window, $modulus);")

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)

  // the only non-child argument state is (window, modulus) — both baked in
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_bounds requires a STRING text column, got $other")
    }
}

object CdcBounds {
  /** Static so generated code calls straight into one compiled method.
    * Thread-local digest: MessageDigest is stateful and codegen'd tasks
    * run concurrently in one JVM.
    */
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String, window: Int, modulus: Int): ArrayData = {
    // split(" ", -1): single-space regex, empty tokens kept — identical to
    // split(text, ' ') in Spark SQL and string_split in DuckDB
    val words = text.toString.split(" ", -1)
    val n = words.length
    val buf = new scala.collection.mutable.ArrayBuffer[Int](8)
    buf += 0
    if (n >= window) {
      val md = md5.get()
      val sb = new java.lang.StringBuilder(64)
      var i = window // 1-based end position of the current window
      while (i <= n) {
        sb.setLength(0)
        var j = i - window
        while (j < i) {
          if (j > i - window) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        md.reset()
        val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars as a base-16 integer: 7 full bytes big-endian,
        // then the high nibble of byte 7 — 60 bits, never negative
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xfL)
        if (h % modulus == 0L) buf += i
        i += 1
      }
    }
    // bracket with n; a boundary AT n would duplicate it — callers filter
    // empty spans either way, but the canonical form keeps bounds strict
    if (buf(buf.length - 1) != n) buf += n
    new GenericArrayData(buf.toArray)
  }
}
