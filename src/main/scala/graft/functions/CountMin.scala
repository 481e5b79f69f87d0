package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
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
  * under-counts (est >= true; over-count bounded by e/width · N per
  * the usual CMS analysis). The row hashes are ONE xxhash64 of the
  * value split into TWO 31-bit residues `h1 = h mod M`,
  * `h2 = (h >> 31) mod M`, with row i probing
  * `(a_i·h1 + b_i + i·h2) mod M mod width` — the Kirsch–Mitzenmacher
  * two-hash construction (ACM ESA 2006) under the Carter-Wegman
  * mixers, so the per-row functions stay pairwise-uniform and avoid
  * the ~2⁻³¹ all-rows-collide floor a single shared residue would
  * give. Two distinct keys can still collide in EVERY row two ways:
  * both 31-bit residues collide (~2⁻⁶²), or — the dominant term —
  * each row's post-mix values land in the same bucket mod width by
  * chance, probability ~(1/width)^depth (≈2⁻⁴⁴ at q57's 4×2048,
  * larger at smaller widths). The stated guarantee is therefore the
  * per-round empirical oracle match (q57/q67 twins check exact
  * counts), not the collision bound alone.
  * [[CountMin.estimate]] computes the identical bucket index
  * with the built-in `xxhash64`/`shiftright` column functions plus
  * codegen'd integer arithmetic, so the aggregate and the probe
  * agree bit-for-bit at one hash per row (the scheme is
  * oracle-INVISIBLE: the q57/q67 twins check exact counts, not
  * buckets — see the minhash precedent in operators/Dedup.scala for
  * the oracle-visible variant of the same trick).
  */
case class CountMinAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with CountMinBase {

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.hashValue(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < depth) {
        buf(i * width + CountMin.bucket(i, h, width)) += 1L
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
  /** Carter-Wegman modulus and per-row mixing constants — the same
    * formula family as `Dedup.minhashMixers`; bounds keep a·h+b < 2^63
    * so the arithmetic is overflow-free under ANSI in both the JVM
    * update loop and the codegen'd estimate expression. */
  private[graft] val MixPrime = 2147483647L
  private[graft] def mixer(i: Int): (Long, Long) = (
    (2654435761L * (i + 1) + 1013904223L) % (MixPrime - 1) + 1,
    (1103515245L * (i + 1) + 12345L) % MixPrime)

  /** The one per-row hash: identical to the SQL `xxhash64(v)` column
    * function (seed 42), so the aggregate's buckets and
    * [[estimate]]'s codegen'd probe agree bit-for-bit. */
  private[graft] def hashValue(v: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, org.apache.spark.sql.types.StringType, 42L)

  /** Row-i bucket of hash `h`: ((a_i·h1 + b_i + i·h2) mod M) mod width
    * where h1/h2 are the two 31-bit residues of `h` (see class doc).
    * Overflow-free: a_i·h1 < 2⁶², the mod brings it under 2³¹, and
    * i·h2 < depth·2³¹ ≪ 2⁶³. */
  private[graft] def bucket(i: Int, h: Long, width: Int): Int = {
    val h1 = ((h % MixPrime) + MixPrime) % MixPrime
    val h2 = (((h >> 31) % MixPrime) + MixPrime) % MixPrime
    val (a, b) = mixer(i)
    ((((a * h1 + b) % MixPrime + i.toLong * h2) % MixPrime) % width).toInt
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
    * over rows of the value's bucket. ONE xxhash64 plus integer
    * arithmetic per row — pure built-in functions, so it runs
    * codegen'd and the bucket math is bit-identical to the
    * aggregate's [[bucket]]. */
  def estimate(sketch: Column, value: Column, depth: Int, width: Int): Column = {
    // cast to string FIRST: the aggregate side always hashes a
    // UTF8String (update() runs on the string child), so a probe with a
    // non-string column must hash the same string rendering — xxhash64
    // of a native int and of its string form differ, and a mismatched
    // probe reads wrong buckets and can UNDER-count, breaking the
    // one-sided CMS guarantee
    val h = xxhash64(value.cast("string"))
    val h1 = pmod(h, lit(MixPrime))
    val h2 = pmod(shiftright(h, 31), lit(MixPrime))
    least((0 until depth).map { i =>
      val (a, b) = mixer(i)
      element_at(sketch,
        (lit(i * width) +
          (pmod(lit(a) * h1 + lit(b), lit(MixPrime)) + lit(i.toLong) * h2)
            % lit(MixPrime) % lit(width.toLong))
          .cast("int") + 1)
    }: _*)
  }
}
