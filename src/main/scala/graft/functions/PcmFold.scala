package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types._

/** Single-pass PCM sample fold over a canonical WAV blob: one
  * `byte[]` traversal producing struct(n_samples, sample_sum,
  * sample_peak) — the vectorized kernel the interpreted HOF fold in
  * `MultiModal.pcmSampleStatsHof` documents as its swap-point.
  *
  * The HOF form is O(samples × blob): Spark's higher-order functions
  * never enter codegen, and every per-sample `substr(content, i, 1)`
  * in the interpreted lambda re-materializes the WHOLE binary field
  * from the UnsafeRow (`getBinary` copies the full buffer), so a 100 KB
  * WAV costs ~10 GB of memcpy. This expression reads the array once
  * and loops over primitive bytes inside whole-stage codegen —
  * O(blob), ~4 orders of magnitude less memory traffic at fixture
  * scale, and the difference between "demo" and "usable on a 100 TB
  * audio corpus".
  *
  * Semantics are bit-equal to the HOF fold (spec-pinned on the
  * fixtures): NULL unless the blob is canonical PCM WAV (RIFF/WAVEfmt
  * /data signature, audio format 1, bit depth 8 or 16); 16-bit samples
  * are signed LE, 8-bit are unsigned recentered by −128; sum is the
  * exact signed sum, peak is max |sample|; a declared data chunk that
  * overruns the actual payload yields (n_samples, NULL, NULL) — the
  * same poisoned-fold answer the HOF's out-of-range byte reads
  * produce.
  */
case class PcmFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_sum", LongType, nullable = true),
    StructField("sample_peak", LongType, nullable = true)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"PcmFold needs a binary input, got ${child.dataType}")

  protected override def nullSafeEval(input: Any): Any =
    PcmFold.fold(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pcmRow")
      s"""
         |InternalRow $r = graft.functions.PcmFold.fold($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ($resultType) $r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pcm_fold"
}

object PcmFold {

  /** Column API: struct(n_samples, sample_sum, sample_peak) for
    * canonical PCM WAV content, NULL otherwise. */
  def pcmStats(content: Column): Column = column(PcmFold(expression(content)))

  /** The kernel — also called directly from generated code. Returns
    * null for anything that is not canonical PCM WAV. */
  def fold(b: Array[Byte]): InternalRow = {
    if (b.length < 44) return null
    @inline def u8(i: Int): Int = b(i) & 0xff
    val sig = b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
      b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ' &&
      b(36) == 'd' && b(37) == 'a' && b(38) == 't' && b(39) == 'a'
    if (!sig) return null
    val fmt = u8(20) | (u8(21) << 8)
    val bits = u8(34) | (u8(35) << 8)
    if (fmt != 1 || (bits != 8 && bits != 16)) return null
    val dataLen = u8(40).toLong | (u8(41).toLong << 8) |
      (u8(42).toLong << 16) | (u8(43).toLong << 24)
    val bps = bits / 8
    val n = dataLen / bps
    if (44L + dataLen > b.length)
      return new GenericInternalRow(Array[Any](n, null, null))
    var sum = 0L
    var peak = 0L
    var i = 0
    val nn = n.toInt
    if (bits == 16) {
      while (i < nn) {
        val o = 44 + 2 * i
        val s = (u8(o) | (u8(o + 1) << 8)).toShort.toLong
        sum += s
        val a = math.abs(s)
        if (a > peak) peak = a
        i += 1
      }
    } else {
      while (i < nn) {
        val s = (u8(44 + i) - 128).toLong
        sum += s
        val a = math.abs(s)
        if (a > peak) peak = a
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](n, sum, peak))
  }
}
