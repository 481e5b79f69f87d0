package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Top-k rows by (priority DESC, tiebreak ASC) as a
  * `TypedImperativeAggregate`: the input is a struct whose field 0 is a
  * double priority, field 1 a string tiebreak, and the remainder
  * payload; the result is the k best structs, best first. The
  * aggregation buffer is a size-capped heap — O(k) state per group
  * regardless of group size, where a window `row_number <= k` sorts the
  * whole stratum. Partial aggregation applies: each map task keeps its
  * own k per group, ships k rows to the exchange, and merge unions
  * heaps — the distributed-reservoir merge as a first-class aggregate
  * (BottomK's serde pattern, generalized to carry whole rows).
  *
  * Powers [[graft.operators.Sampling.weightedTopK]], where priority is
  * the A-Res key u^(1/w) and ties (possible only for duplicate row
  * keys) resolve on the key's string form.
  */
case class TopKRows(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[TopKRows.Entry]] {

  require(k > 0, "top_k_rows requires k > 0")
  private def structType: StructType = child.dataType match {
    case st: StructType
      if st.length >= 2 && st(0).dataType == DoubleType &&
        st(1).dataType == StringType => st
    case other => throw new IllegalArgumentException(
      s"top_k_rows needs struct(priority double, tiebreak string, ...), got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  import TopKRows.Entry

  // head of the queue is the WORST kept entry (lowest priority, then
  // largest tiebreak) — the eviction candidate
  override def createAggregationBuffer(): mutable.PriorityQueue[Entry] =
    mutable.PriorityQueue.empty[Entry](Entry.worstFirst)

  @transient private lazy val proj = UnsafeProjection.create(structType)

  private def offer(buf: mutable.PriorityQueue[Entry], e: Entry): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (Entry.worstFirst.compare(e, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(e)
    }
  }

  override def update(buf: mutable.PriorityQueue[Entry],
                      input: InternalRow): mutable.PriorityQueue[Entry] = {
    val v = child.eval(input)
    if (v != null) {
      val in = v.asInstanceOf[InternalRow]
      // a null priority would silently read as 0.0 and a null tiebreak
      // would NPE inside the heap comparator — rows without a defined
      // rank cannot participate, so skip them (the aggregate mirror of
      // SQL aggregates ignoring NULL inputs)
      if (!in.isNullAt(0) && !in.isNullAt(1)) {
        // copy out of the (reused) eval buffers before keeping a reference
        val row = proj(in).copy()
        offer(buf, Entry(row.getDouble(0), row.getUTF8String(1), row))
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Entry],
                     other: mutable.PriorityQueue[Entry]): mutable.PriorityQueue[Entry] = {
    other.foreach(offer(buf, _))
    buf
  }

  /** Best first — (priority desc, tiebreak asc), a deterministic total
    * order whenever (priority, tiebreak) pairs are distinct. */
  override def eval(buf: mutable.PriorityQueue[Entry]): Any =
    new GenericArrayData(
      buf.toArray.sorted(Entry.worstFirst.reverse).map(_.row: Any))

  override def serialize(buf: mutable.PriorityQueue[Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { e =>
      val b = e.row.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Entry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val numFields = structType.length
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      val row = new UnsafeRow(numFields)
      row.pointTo(b, b.length)
      buf.enqueue(Entry(row.getDouble(0), row.getUTF8String(1), row))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k_rows"
}

object TopKRows {

  final case class Entry(pri: Double, tb: UTF8String, row: UnsafeRow)

  object Entry {
    /** Max-heap order for eviction: the "largest" entry is the worst —
      * lowest priority, then largest tiebreak (binary UTF8 order, which
      * is Spark's string comparison). */
    val worstFirst: Ordering[Entry] = new Ordering[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Double.compare(b.pri, a.pri)
        if (c != 0) c else a.tb.compareTo(b.tb)
      }
    }
  }

  /** Column API: the k best rows of `c` — struct(priority double,
    * tiebreak string, payload...) — best first. */
  def topKRows(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      TopKRows(org.apache.spark.sql.graft.bridge.expression(c), k)
        .toAggregateExpression())
}
