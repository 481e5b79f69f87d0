package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 2-D Z-order (Morton) interleave: bits of two non-negative
  * 31-bit longs alternate into one 62-bit key (`a` even bits, `b` odd).
  *
  * Sorting/range-partitioning a table by this key clusters rows that
  * are close in BOTH dimensions into the same files, so per-file
  * min/max statistics prune selective scans on EITHER dimension — the
  * multi-dimensional layout trick (Z-order clustering) that a single
  * sort column cannot give. At 100 TB a fact table laid out this way
  * answers both "one user's history" and "one day across users" with
  * a fraction of the files; correctness never depends on it (pruning
  * is a statistics filter), which keeps the layout a pure write-side
  * optimization.
  *
  * Out-of-range inputs (negative or >= 2^31) fail fast — a silent mask
  * would interleave garbage and destroy locality unnoticed.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ZOrder2 needs (bigint, bigint), got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder2.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 31 bits of `v` onto even bit positions (the
    * standard mask-and-shift Morton spread, 5 steps). */
  private def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of two 31-bit non-negative values; callable from
    * generated code (static forwarder). */
  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || a >= (1L << 31) || b < 0 || b >= (1L << 31))
      throw new IllegalArgumentException(
        s"zorder2: inputs must be in [0, 2^31), got ($a, $b)")
    spread(a) | (spread(b) << 1)
  }

  /** Column API: Morton key of two non-negative long columns. */
  def zorder2(a: Column, b: Column): Column =
    column(ZOrder2(expression(a), expression(b)))
}
