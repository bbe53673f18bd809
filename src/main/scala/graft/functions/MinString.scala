package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mutable holder so the aggregation buffer object itself is never
  * null (the value inside may be — "no non-null input seen yet"). */
final class MinStringBuffer(var value: UTF8String) extends Serializable

/** `min_string(col)` — MIN over a string column as a
  * TypedImperativeAggregate.
  *
  * Why it exists: Spark's declarative `min` keeps its running value
  * in the grouping buffer, and a STRING buffer field disqualifies
  * `HashAggregateExec` (fixed-width mutable buffers only) — the
  * planner silently falls back to `SortAggregateExec`, which SORTS
  * the whole input on the grouping key first. For the J1/J2 lookup
  * dedup (`groupBy(searchKey).agg(min(wanted))`,
  * `/root/reference/src/DBT.php:300-307` pluck-hash semantics made
  * deterministic) that is a full sort of the lookup table per refer.
  * A TypedImperativeAggregate is `ObjectHashAggregateExec`-eligible:
  * hash-based, no sort, one UTF8String per live group. Ordering is
  * `UTF8String.compareTo` — identical to the builtin `min`'s
  * StringType ordering, so results are bit-identical and the DuckDB
  * oracle mirrors (`min(...)`) are unaffected. */
case class MinString(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinStringBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): MinStringBuffer = new MinStringBuffer(null)

  override def update(buffer: MinStringBuffer, input: InternalRow): MinStringBuffer = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null && (buffer.value == null || v.compareTo(buffer.value) < 0)) {
      // clone: the eval result may point into a reused row buffer
      buffer.value = v.clone()
    }
    buffer
  }

  override def merge(b1: MinStringBuffer, b2: MinStringBuffer): MinStringBuffer = {
    if (b2.value != null && (b1.value == null || b2.value.compareTo(b1.value) < 0))
      b1.value = b2.value
    b1
  }

  override def eval(buffer: MinStringBuffer): Any = buffer.value

  // serialized form: 0x00 = "no value yet"; 0x01 ++ utf8 bytes = value
  // (a bare empty array would be ambiguous with the empty string)
  override def serialize(buffer: MinStringBuffer): Array[Byte] =
    if (buffer.value == null) Array[Byte](0)
    else {
      val b = buffer.value.getBytes
      val out = new Array[Byte](b.length + 1)
      out(0) = 1
      System.arraycopy(b, 0, out, 1, b.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): MinStringBuffer =
    if (bytes(0) == 0) new MinStringBuffer(null)
    else new MinStringBuffer(UTF8String.fromBytes(bytes, 1, bytes.length - 1))

  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "min_string"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinString =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinString =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinString =
    copy(child = newChild)
}

object MinString {
  /** Column form of [[MinString]] (non-distinct aggregate). */
  def minString(c: Column): Column =
    ColumnBridge.column(
      MinString(ColumnBridge.expression(c)).toAggregateExpression())
}
