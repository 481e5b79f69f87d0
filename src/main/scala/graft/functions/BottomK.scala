package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k strings as a `TypedImperativeAggregate`: the k
  * lexicographically smallest values of `child`, returned sorted
  * ascending. The aggregation buffer is a size-capped max-heap — O(k)
  * state per group regardless of group size, where the
  * collect_list+sort+slice formulation this replaces buffers the whole
  * group before slicing. Partial aggregation applies: each map task
  * keeps its own k, shuffles k rows per group, and merge unions heaps.
  *
  * Used by the document fingerprint (bottom-k shingle-hash sketch,
  * TextAnalysis.fingerprint): bottom-k of a uniform hash is a
  * permutation-stable sketch whose overlap estimates set containment.
  */
case class BottomK(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[String]] {

  require(k > 0, "bottom_k requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // natural String ordering: head of the queue is the LARGEST kept
  // value, i.e. the eviction candidate
  override def createAggregationBuffer(): mutable.PriorityQueue[String] =
    mutable.PriorityQueue.empty[String]

  private def offer(buf: mutable.PriorityQueue[String], v: String): Unit = {
    if (buf.size < k) buf.enqueue(v)
    else if (v < buf.head) { buf.dequeue(); buf.enqueue(v) }
  }

  override def update(buf: mutable.PriorityQueue[String],
                      input: InternalRow): mutable.PriorityQueue[String] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: mutable.PriorityQueue[String],
                     other: mutable.PriorityQueue[String]): mutable.PriorityQueue[String] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[String]): Any =
    new GenericArrayData(
      buf.toArray.sorted.map(UTF8String.fromString(_): Any))

  // length-prefixed raw UTF-8, not writeUTF: writeUTF throws on values
  // whose encoding exceeds 64 KiB, and bottomK(c, k) is a general Column
  // API — callers may aggregate arbitrarily long strings
  override def serialize(buf: mutable.PriorityQueue[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.enqueue(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomK =
    copy(child = newChildren.head)
  override def prettyName: String = "bottom_k"
}

object BottomK {
  /** Column API: bottom-k smallest values of `c`, sorted ascending. */
  def bottomK(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      BottomK(org.apache.spark.sql.graft.bridge.expression(c), k)
        .toAggregateExpression())
}
