package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `BloomContains(col, filter)` — probabilistic membership of a string
  * column in a pre-built Bloom filter, as a native codegen'd expression
  * (no UDF). FALSE is definite ("not in the set"); TRUE means "maybe" —
  * callers follow with an exact probe on the TRUE side only, which is the
  * classic dedup pre-screen: the filter prunes the definite-new majority
  * from the expensive exact join entirely.
  *
  * The sketch is carried as a [[BloomFilter]] FIELD of the expression — a
  * plan reference object that ships with the serialized task binary (the
  * same mechanism as a broadcast variable's value), NEVER through SQL
  * text. This is the scale-correct plumbing: a corpus-scale filter
  * (10⁹ keys at 1% FP ≈ 1.2 GB) would choke the ANTLR parser as a base64
  * literal, but serializes linearly as plan state. Driver-side cost is
  * O(sketch bytes) — no encode, no parse. Construct via
  * [[BloomContains.mightContain]] (the Column API factory).
  *
  * A SQL form `bloom_might_contain(col, 'base64')` remains registered for
  * interactive use, but its builder enforces [[BloomContains.maxSqlSketchBytes]]
  * on the DECODED size and directs larger sketches to the Column factory —
  * the parser path is a convenience, not the hot path.
  *
  * Spark's `BloomFilter.putString` hashes the UTF-8 bytes, so the binary
  * probe over `UTF8String.getBytes` sees the identical key bytes — the
  * no-false-negative contract holds across the stat-API build and this
  * expression (spec-asserted in BloomContainsSpec).
  */
case class BloomContains(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a STRING column, got ${dt.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  // the filter is payload, not identity — keep plan strings short
  override def toString: String = s"bloom_might_contain($child)"
  override def sql: String = s"bloom_might_contain(${child.sql})"

  /** Plan-identity digest of the sketch CONTENTS: two expressions built
    * from equal (but distinct) filter objects must compare equal, or
    * Catalyst's canonicalization-based sharing — common-subexpression
    * elimination, cached-plan and exchange reuse — silently misses.
    * Streamed through the digest (no serialized copy is materialized),
    * computed lazily once per instance and only when a plan comparison
    * actually asks.
    */
  @transient private lazy val sketchDigest: scala.collection.immutable.ArraySeq[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    filter.writeTo(new java.security.DigestOutputStream(
      java.io.OutputStream.nullOutputStream(), md))
    scala.collection.immutable.ArraySeq.unsafeWrapArray(md.digest())
  }

  override def equals(other: Any): Boolean = other match {
    case b: BloomContains => child == b.child && sketchDigest == b.sketchDigest
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child, sketchDigest)

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  /** Decoded-size ceiling for the SQL-literal form. Beyond this, the
    * base64 string bloats ANTLR parsing and plan text; use
    * [[mightContain]], which never encodes the sketch at all.
    */
  val maxSqlSketchBytes: Int = 4 << 20 // 4 MiB

  /** Column-API factory — the scale path: the filter rides the expression
    * tree as a reference object; zero driver-side encoding, zero parsing.
    */
  def mightContain(c: Column, bf: BloomFilter): Column =
    GraftSqlShims.column(BloomContains(GraftSqlShims.expression(c), bf))

  def encode(bf: BloomFilter): String = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  def decode(b64: String): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(b64)))

  /** SQL-builder entry: decode with the size cap enforced. */
  def fromSqlLiteral(child: Expression, b64: String): BloomContains = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    require(bytes.length <= maxSqlSketchBytes,
      s"bloom_might_contain SQL literal decodes to ${bytes.length} bytes " +
        s"(cap $maxSqlSketchBytes): a sketch this large must not transit " +
        "the SQL parser - build the Column with BloomContains.mightContain")
    BloomContains(child,
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
  }
}
