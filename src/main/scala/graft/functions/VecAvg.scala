package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import java.nio.ByteBuffer

/** `vec_avg(embedding)` — element-wise mean of ARRAY&lt;FLOAT&gt; vectors as a
  * native Catalyst aggregate (the embedding-centroid primitive).
  *
  * Why a custom aggregate instead of the declarative
  * `posexplode(embedding) → groupBy(key, pos) → avg`: explode multiplies the
  * shuffled row count by the vector dimension (64× here) and the per-group
  * agg state by the same factor. This aggregate keeps ONE (sums, count)
  * buffer per group per partition — partial aggregation (map-side combine)
  * works on whole vectors, so the shuffle carries `groups × (dim+1)` doubles
  * instead of `rows × dim` rows. At 100 TB that's the difference between a
  * metadata-sized shuffle and re-shuffling the corpus 64 times over.
  *
  * Semantics (mirrored by the v6 oracle): NULL arrays are skipped; a NULL
  * element contributes 0 to its dimension's sum while the row still counts
  * (training embeddings never carry NULL elements; documented, not load-
  * bearing); an empty group yields NULL; the first row fixes the dimension
  * and a mismatched length throws (vector columns are fixed-width by
  * contract — FloatDot makes the same assumption).
  */
case class VecAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecAvg.Buffer] with UnaryLike[Expression] {

  override def prettyName: String = "vec_avg"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_avg requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): VecAvg.Buffer = new VecAvg.Buffer(null, 0L)

  override def update(b: VecAvg.Buffer, input: InternalRow): VecAvg.Buffer = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (b.sums == null) b.sums = new Array[Double](n)
    require(b.sums.length == n,
      s"vec_avg: vector length mismatch (${b.sums.length} vs $n)")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) b.sums(i) += arr.getFloat(i).toDouble
      i += 1
    }
    b.count += 1
    b
  }

  override def merge(b: VecAvg.Buffer, o: VecAvg.Buffer): VecAvg.Buffer = {
    if (o.sums == null) return b
    if (b.sums == null) { b.sums = o.sums.clone(); b.count = o.count; return b }
    require(b.sums.length == o.sums.length,
      s"vec_avg: vector length mismatch (${b.sums.length} vs ${o.sums.length})")
    var i = 0
    while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
    b.count += o.count
    b
  }

  override def eval(b: VecAvg.Buffer): Any =
    if (b.count == 0L || b.sums == null) null
    else new GenericArrayData(b.sums.map(_ / b.count))

  override def serialize(b: VecAvg.Buffer): Array[Byte] = {
    val dim = if (b.sums == null) 0 else b.sums.length
    val buf = ByteBuffer.allocate(8 + 4 + 8 * dim)
    buf.putLong(b.count).putInt(dim)
    var i = 0
    while (i < dim) { buf.putDouble(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VecAvg.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val count = buf.getLong()
    val dim = buf.getInt()
    if (dim == 0) new VecAvg.Buffer(null, count)
    else {
      val sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { sums(i) = buf.getDouble(); i += 1 }
      new VecAvg.Buffer(sums, count)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecAvg =
    copy(child = newChild)
}

object VecAvg {
  /** Mutable (sums, count) — one per group per partition; `sums` stays null
    * until the first non-null vector fixes the dimension.
    */
  final class Buffer(var sums: Array[Double], var count: Long)
}
