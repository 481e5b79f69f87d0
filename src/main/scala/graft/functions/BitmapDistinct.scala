package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact mergeable distinct-count sketch over a bounded integer id
  * domain, as a fixed-size bitset `TypedImperativeAggregate` (the
  * BottomK/CountMin pattern). One bit per id: `maxId/64` Long words per
  * group regardless of input size, map-side partials merge by bitwise
  * OR, and pre-aggregated sketches (per day, per source, per shard)
  * union losslessly the same way. That is the 100 TB telemetry shape
  * for EXACT distinct counts over bounded key spaces (user ids, device
  * ids, experiment buckets): sketch once near the data, roll up daily
  * kilobyte bitmaps forever after, never re-scan the raw stream —
  * COUNT(DISTINCT) without the double shuffle, and unlike HLL the
  * union is exact, so downstream counts reconcile to the ledger.
  *
  * Ids outside `[0, maxId)` fail fast — a silent mask would undercount.
  */
case class BitmapAgg(
    child: Expression, maxId: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BitmapBase {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Number].longValue()
      require(id >= 0 && id < maxId,
        s"bitmap distinct: id $id outside [0, $maxId)")
      buf((id >> 6).toInt) |= 1L << (id & 63)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "bitmap_distinct_sketch"
}

/** Unions already-built bitsets (arrays produced by [[BitmapAgg]] with
  * the same `maxId`) by bitwise OR — the roll-up half of the
  * pre-aggregate-then-merge pipeline. */
case class BitmapMergeAgg(
    child: Expression, maxId: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BitmapBase {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == buf.length,
        s"bitmap size ${arr.numElements()} != ${buf.length} words")
      var i = 0
      while (i < buf.length) { buf(i) |= arr.getLong(i); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "bitmap_distinct_merge"
}

/** Shared buffer/serde plumbing for the two bitmap aggregates. */
trait BitmapBase { self: TypedImperativeAggregate[Array[Long]] =>
  def child: Expression
  def maxId: Int
  require(maxId > 0, "bitmap distinct needs maxId > 0")
  protected def words: Int = (maxId + 63) >> 6

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }
}

object BitmapDistinct {
  private def expr(c: Column) = org.apache.spark.sql.graft.bridge.expression(c)
  private def aggCol(e: Expression) =
    org.apache.spark.sql.graft.bridge.column(e)

  /** Column API: bitset sketch of integer id column `c` over `[0, maxId)`. */
  def bitmapSketch(c: Column, maxId: Int): Column =
    aggCol(BitmapAgg(expr(c), maxId).toAggregateExpression())

  /** Column API: bitwise-OR union of sketches built with the same `maxId`. */
  def bitmapMerge(c: Column, maxId: Int): Column =
    aggCol(BitmapMergeAgg(expr(c), maxId).toAggregateExpression())

  /** Exact distinct count from a sketch column: popcount over the words.
    * A fold over a few dozen longs on one row per group — the cost
    * lives in the aggregates, not here. */
  def cardinality(sketch: Column): Column =
    aggregate(sketch, lit(0L), (acc, w) => acc + bit_count(w).cast("long"))
}
