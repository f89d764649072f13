package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(col, 'base64-sketch')` — probabilistic membership
  * of a string column in a pre-built Bloom filter, as a native codegen'd
  * expression (no UDF). FALSE is definite ("not in the set"); TRUE means
  * "maybe" — callers follow with an exact probe on the TRUE side only,
  * which is the classic dedup pre-screen: the filter prunes the
  * definite-new majority from the expensive exact join entirely.
  *
  * The sketch arrives as a base64 STRING LITERAL (built with Spark's own
  * `DataFrameStatFunctions.bloomFilter`, serialized via
  * [[BloomContains.encode]]), deserialized ONCE per executor-plan instance
  * (lazy val / codegen reference object, never per row). A plan literal
  * ships with the serialized plan exactly like a broadcast variable would,
  * so the cost model is the same at any sketch size; the membership check
  * itself is two Murmur3 hashes against a bit array — no shuffle, no join,
  * whole-stage-codegen friendly.
  *
  * Spark's `BloomFilter.putString` hashes the UTF-8 bytes, so the binary
  * probe over `UTF8String.getBytes` sees the identical key bytes — the
  * no-false-negative contract holds across the stat-API build and this
  * expression (spec-asserted in FunctionsSpec).
  */
case class BloomContains(child: Expression, bloomB64: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a STRING column, got ${dt.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf: BloomFilter = BloomContains.decode(bloomB64)

  override def nullSafeEval(input: Any): Any =
    bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  def encode(bf: BloomFilter): String = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  def decode(b64: String): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(b64)))
}
