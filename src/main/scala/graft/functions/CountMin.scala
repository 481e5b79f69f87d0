package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch over a string column as a `TypedImperativeAggregate`
  * (the BottomK pattern): `depth × width` counters, row i incremented at
  * `h_i(v) mod width`. The buffer is a flat Long array — O(depth·width)
  * state per group regardless of input size, map-side partials merge by
  * element-wise addition, and pre-aggregated sketches (per partition,
  * per day, per source) union losslessly the same way — the mergeable
  * telemetry shape for 100 TB streams: sketch once near the data, ship
  * kilobytes.
  *
  * Point estimates read `min_i counters[i][h_i(v)]`, which never
  * under-counts (est >= true; over-count bounded by e/width · N with
  * prob 1-(1/2)^depth). The row hashes are md5-derived
  * (`md5(i ":" v)` -> first 60 bits), so [[CountMin.estimate]] can
  * compute the identical bucket index with built-in column functions
  * and any engine with md5 can replicate the sketch bit-for-bit.
  */
case class CountMinAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with CountMinBase {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < depth) {
        buf(i * width + (CountMin.hashRow(i, s) % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "count_min_sketch_graft"
}

/** Unions already-built sketches (arrays produced by [[CountMinAgg]] with
  * the same depth×width) by element-wise addition — the second half of
  * the pre-aggregate-then-merge pipeline: daily/per-source sketches roll
  * up without touching the raw stream again. */
case class CountMinMergeAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with CountMinBase {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == buf.length,
        s"sketch size ${arr.numElements()} != ${depth}x$width")
      var i = 0
      while (i < buf.length) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "count_min_merge"
}

/** Shared buffer/serde plumbing for the two sketch aggregates. */
trait CountMinBase { self: TypedImperativeAggregate[Array[Long]] =>
  def child: Expression
  def depth: Int
  def width: Int
  require(depth > 0 && width > 0, "count-min needs depth > 0 and width > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
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

object CountMin {
  /** Row-i hash of `v`: first 60 bits of md5("i:" + v), identical to the
    * SQL-side `conv(substring(md5(concat('i:', v)), 1, 15), 16, 10)`. */
  private[graft] def hashRow(i: Int, v: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$i:$v".getBytes(StandardCharsets.UTF_8))
    var acc = 0L
    var j = 0
    while (j < 8) { acc = (acc << 8) | (d(j) & 0xffL); j += 1 }
    acc >>> 4 // 16 nibbles -> the first 15 hex chars' worth
  }

  private def expr(c: Column) = org.apache.spark.sql.graft.bridge.expression(c)
  private def aggCol(e: Expression) =
    org.apache.spark.sql.graft.bridge.column(e)

  /** Column API: depth×width count-min sketch of string column `c`. */
  def countMinSketch(c: Column, depth: Int, width: Int): Column =
    aggCol(CountMinAgg(expr(c), depth, width).toAggregateExpression())

  /** Column API: element-wise union of sketches built with the same
    * depth×width. */
  def countMinMerge(c: Column, depth: Int, width: Int): Column =
    aggCol(CountMinMergeAgg(expr(c), depth, width).toAggregateExpression())

  /** Point estimate of `value`'s count from a sketch column: the minimum
    * over rows of the value's bucket. Pure built-in functions (md5 /
    * conv / element_at), so it runs codegen'd and the bucket math is
    * bit-identical to the aggregate's. */
  def estimate(sketch: Column, value: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { i =>
      element_at(sketch,
        (lit(i * width) +
          pmod(conv(substring(md5(concat(lit(s"$i:"), value)), 1, 15), 16, 10)
            .cast("long"), lit(width.toLong))).cast("int") + 1)
    }: _*)
}
