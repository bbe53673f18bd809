package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded KMV (k-minimum-values) buffer: the `size` smallest DISTINCT
  * 64-bit values seen so far, kept UNSIGNED-ascending in a fixed
  * `k`-slot array. Insertion is one unsigned binary search plus an
  * arraycopy shift — O(log k + k) worst case, zero allocation after
  * construction. */
final class KmvBuffer(val k: Int) extends Serializable {
  val arr: Array[Long] = new Array[Long](k)
  var size: Int = 0

  /** Insert `v` preserving sortedness/distinctness; values above the
    * current k-th minimum (with a full buffer) are dropped. */
  def add(v: Long): Unit = {
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(arr(mid), v)
      if (c < 0) lo = mid + 1
      else if (c > 0) hi = mid
      else return // already present — KMV is a DISTINCT sketch
    }
    if (lo == size) {
      if (size < k) { arr(size) = v; size += 1 }
      // else: v exceeds the k-th minimum — not a candidate
    } else if (size < k) {
      System.arraycopy(arr, lo, arr, lo + 1, size - lo)
      arr(lo) = v
      size += 1
    } else {
      System.arraycopy(arr, lo, arr, lo + 1, k - lo - 1)
      arr(lo) = v
    }
  }
}

/** `kmv_agg(hash, k)` — the k smallest DISTINCT values of a LONG hash
  * column per group, unsigned-ascending (array<bigint>, length
  * min(k, distinct)). The KMV distinct-count sketch in its raw form:
  * mergeable (union two sketches = re-insert one into the other, the
  * result is exactly the sketch of the concatenated input) AND
  * bit-exactly replayable in plain SQL (`list_sort(list_distinct(
  * list(x)))[1:k]` over the same hashes), which the DataSketches HLL
  * estimator is not — that is the whole reason this aggregate exists
  * beside [[graft.operators.Profile.distinctSketch]].
  *
  * Scale posture: fixed k-slot long-array buffer per live group
  * (ObjectHashAggregateExec-eligible — hash-based, never a sort
  * fallback), O(log k) per input row after warmup since values above
  * the running k-th minimum short-circuit at the binary search. The
  * estimate derives downstream from the k-th element in exact integer
  * math ([[graft.operators.Profile.kmvSketch]]). */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {
  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < b2.size) { b1.add(b2.arr(i)); i += 1 }
    b1
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buffer.arr, buffer.size))

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    // serialized form is already sorted+distinct: bulk restore
    var i = 0
    while (i < n) { buf.arr(i) = bb.getLong; i += 1 }
    buf.size = n
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  /** Column form of [[KmvAgg]] (non-distinct aggregate — distinctness
    * is the buffer's own invariant). */
  def kmvAgg(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
