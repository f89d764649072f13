package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import java.nio.ByteBuffer
import java.util.Arrays

/** `top_k(value, k)` — the k largest DOUBLE values of each group, descending,
  * as a native Catalyst aggregate with a bounded min-heap buffer.
  *
  * Why a custom aggregate instead of the declarative window
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`: the window
  * form shuffles EVERY row to its group's partition and sorts the whole
  * group, so the shuffle is sized by the input. This aggregate is a real
  * partial aggregation: each map task keeps at most k doubles per group and
  * the shuffle carries `groups × k` values — at 100 TB the difference
  * between re-shuffling the corpus and shuffling metadata. (Spark's own
  * global ORDER BY+LIMIT top-k, TakeOrderedAndProject, has no grouped form;
  * this is that operator per group.)
  *
  * Semantics (mirrored by the q24 oracle): NULL values are skipped (like
  * max); an all-NULL or empty group yields an empty array; ties at the
  * k-boundary pick an arbitrary winner, but since values tie the RESULT
  * multiset is deterministic — which is why the function returns values,
  * not rows.
  */
case class TopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopK.Buffer] with UnaryLike[Expression] {

  override def prettyName: String = "top_k"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"top_k requires k > 0, got $k")
    else child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k requires a DOUBLE value (cast explicitly), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): TopK.Buffer = new TopK.Buffer(k)

  override def update(b: TopK.Buffer, input: InternalRow): TopK.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TopK.Buffer, o: TopK.Buffer): TopK.Buffer = {
    var i = 0
    while (i < o.size) { b.add(o.heap(i)); i += 1 }
    b
  }

  override def eval(b: TopK.Buffer): Any = {
    val out = Arrays.copyOf(b.heap, b.size)
    Arrays.sort(out)
    // ascending → descending in place
    var i = 0
    var j = out.length - 1
    while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: TopK.Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.size)
    buf.putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putDouble(b.heap(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopK.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val b = new TopK.Buffer(k)
    var i = 0
    while (i < n) { b.add(buf.getDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopK =
    copy(child = newChild)
}

object TopK {
  /** Bounded binary MIN-heap of capacity k: the root is the smallest kept
    * value, so a new value either displaces it (strictly larger) or is
    * discarded in O(1) — per-row cost O(log k), memory exactly k doubles.
    */
  final class Buffer(val k: Int) {
    val heap = new Array[Double](k)
    var size = 0

    def add(v: Double): Unit = {
      if (size < k) {
        heap(size) = v
        size += 1
        var i = size - 1
        while (i > 0 && heap((i - 1) / 2) > heap(i)) {
          val p = (i - 1) / 2
          val t = heap(p); heap(p) = heap(i); heap(i) = t
          i = p
        }
      } else if (v > heap(0)) {
        heap(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && heap(l) < heap(m)) m = l
          if (r < size && heap(r) < heap(m)) m = r
          if (m == i) done = true
          else {
            val t = heap(m); heap(m) = heap(i); heap(i) = t
            i = m
          }
        }
      }
    }
  }
}
