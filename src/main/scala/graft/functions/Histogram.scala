package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact mergeable histogram over a bounded integer value domain — the
  * counts-array sibling of [[BitmapAgg]]: `buckets` Long counters per
  * group regardless of input size, map-side partials merge by
  * element-wise addition, and persisted histograms (per day, per shard)
  * roll up losslessly the same way. That turns EXACT quantiles into a
  * pre-aggregate-then-merge pipeline: at 100 TB you sketch each
  * partition once, store kilobyte arrays, and any window's p50/p99 is a
  * merge of stored counters plus an O(domain) scan — no re-sort, no
  * re-scan, and unlike t-digest/approx_percentile the answer is exact
  * and reconciles across engines.
  *
  * Values outside `[0, buckets)` fail fast — silent clamping would
  * corrupt the tails quantiles read from.
  */
case class HistogramAgg(
    child: Expression, buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with HistogramBase {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].longValue()
      require(x >= 0 && x < buckets,
        s"histogram: value $x outside [0, $buckets)")
      buf(x.toInt) += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "hist_sketch"
}

/** Element-wise sum of already-built histograms (arrays produced by
  * [[HistogramAgg]] with the same `buckets`) — the roll-up half. */
case class HistogramMergeAgg(
    child: Expression, buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with HistogramBase {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == buf.length,
        s"histogram size ${arr.numElements()} != ${buf.length} buckets")
      var i = 0
      while (i < buf.length) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistogramMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "hist_merge"
}

/** Shared buffer/serde plumbing for the two histogram aggregates. */
trait HistogramBase { self: TypedImperativeAggregate[Array[Long]] =>
  def child: Expression
  def buckets: Int
  require(buckets > 0, "histogram needs buckets > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](buckets)

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

object Histogram {
  private def expr(c: Column) = org.apache.spark.sql.graft.bridge.expression(c)
  private def aggCol(e: Expression) =
    org.apache.spark.sql.graft.bridge.column(e)

  /** Column API: counts array of integer column `c` over `[0, buckets)`. */
  def histSketch(c: Column, buckets: Int): Column =
    aggCol(HistogramAgg(expr(c), buckets).toAggregateExpression())

  /** Column API: element-wise sum of histograms with the same `buckets`. */
  def histMerge(c: Column, buckets: Int): Column =
    aggCol(HistogramMergeAgg(expr(c), buckets).toAggregateExpression())

  /** Total observation count in a histogram. */
  def histTotal(hist: Column): Column =
    aggregate(hist, lit(0L), (a, c) => a + c)

  /** Discrete `pct`-th percentile from a counts array: the smallest
    * value whose cumulative count reaches `pct`% of the total —
    * PostgreSQL/DuckDB `percentile_disc`/`quantile_disc` semantics,
    * decided in exact long arithmetic (`100*cum >= pct*n`), so it
    * hash-matches any engine. One fold over the (bounded, kilobyte)
    * array per group row; the distributed cost lives in the aggregates,
    * not here. Null on an all-empty histogram. */
  def quantileDisc(hist: Column, pct: Int): Column = {
    require(pct > 0 && pct <= 100, "pct in (0, 100]")
    val n = histTotal(hist)
    aggregate(
      hist,
      struct(lit(0L).as("i"), lit(0L).as("cum"), lit(-1L).as("ans")),
      (acc, c) => {
        val cum = acc("cum") + c
        val hit = acc("ans") === lit(-1L) && c > lit(0L) &&
          cum * lit(100L) >= n * lit(pct.toLong)
        struct(
          (acc("i") + lit(1L)).as("i"), cum.as("cum"),
          when(hit, acc("i")).otherwise(acc("ans")).as("ans"))
      },
      acc => when(acc("ans") >= 0L, acc("ans")))
  }
}
