package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Codegen'd dot product of two int8-quantized vectors (array<tinyint>),
  * accumulated in long — the candidate-scan kernel of quantized ANN
  * ([[graft.operators.Similarity.int8TopK]]).
  *
  * The `zip_with` + `aggregate` HOF form evaluates an interpreted
  * lambda per element; this compiles to a tight byte loop inside
  * whole-stage codegen reading 2 bytes per element (the whole point of
  * int8: ¼ the memory traffic of floats). Products and the sum are
  * exact integers (|q| ≤ 127 ⇒ |term| ≤ 16129; 2⁶³ is unreachable for
  * any real dimensionality), so this is bit-equal to the HOF fold it
  * replaces — including null semantics: a null element in either array
  * yields a null dot product, exactly like
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)`
  * where one null product poisons the whole fold. The per-element null
  * check is emitted only when an input's `ArrayType.containsNull` is
  * true, so vectors from [[graft.operators.Similarity]]'s quantizer
  * (containsNull = false) keep the branch-free 2-byte loop.
  */
case class Int8VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) =
      t == ArrayType(ByteType, false) || t == ArrayType(ByteType, true)
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"Int8VecDot needs array<tinyint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  /** Whether either input array may hold null elements — decides, at
    * plan time, if the generated loop needs per-element null checks.
    */
  private lazy val elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _                          => true
    }
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // ev.isNull is a real variable (not the literal "false") exactly
      // when this expression is nullable, which elementsNullable implies.
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8VecDot {
  /** Column API: dot(a, b) over array<tinyint> columns, in long. */
  def dot8(a: Column, b: Column): Column =
    column(Int8VecDot(expression(a), expression(b)))
}
