package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer as a codegen'd Catalyst expression —
  * the real-tokenizer upgrade over the pipeline family's whitespace
  * token counts (q63/q64/q134 budget by words; training-data budgets
  * are set in BPE tokens, and the two diverge 2-5× on real text).
  *
  * The merge table is the published GPT-2 `merges.txt` shape reduced to
  * its content — an ordered list of (left, right) rules, priority =
  * position. Encoding (the exact contract `tools/gen_bpe_fixture.py`'s
  * INDEPENDENT Python implementation mirrors, and the q167 oracle
  * checks):
  *
  *  - words = whitespace-split runs of the input (empties discarded);
  *  - a word starts as its Unicode CODE POINTS (not UTF-16 units — a
  *    surrogate pair is one symbol on both engines);
  *  - loop: find the adjacent pair with the LOWEST rank present in the
  *    word, merge ALL its occurrences leftmost-greedy, repeat until no
  *    adjacent pair is in the table;
  *  - the document's tokens are its words' tokens concatenated.
  *
  * Physical shape at 100 TB: the per-row work runs inside whole-stage
  * codegen (doGenCode emits one static call — the RegExpReplace
  * pattern, no interpreted-lambda HOF per element, no Python worker);
  * the ranks table rides the plan as ONE `ctx.addReferenceObj`
  * reference, serialized once into the stage's task binary (broadcast
  * per stage, not per row — a 50k-rule GPT-2 table is ~2 MB). Lookup
  * is a two-level HashMap (left -> right -> rank), so no separator
  * byte is reserved inside token strings (the NUL-joined-key trap
  * round-15 ADVICE flagged in Dedup).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BpeEncode needs a string input, got ${child.dataType}")

  // left -> (right -> rank); built once per task from the plan-shipped
  // rule list, shared by interpreted and codegen paths
  @transient private lazy val ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]] =
    BpeEncode.buildRanks(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encodeStatic(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, java.util.HashMap<String, Integer>>")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.BpeEncode.encodeStatic($in, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** Column API: BPE-tokenize a string column under an ordered merge
    * list (lower index = higher priority). Returns array<string>. */
  def bpe(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncode(expression(text), merges))

  private[graft] def buildRanks(merges: Seq[(String, String)])
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.computeIfAbsent(l, _ => new java.util.HashMap[String, Integer]())
        .putIfAbsent(r, Int.box(i)) // first occurrence wins, like a rank map
      ()
    }
    m
  }

  /** The per-row kernel, static so generated code calls it directly. */
  def encodeStatic(text: UTF8String,
      ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]])
      : ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    // whitespace-split, empties discarded — Python's str.split()
    val s = text.toString
    var w0 = 0
    var i = 0
    def flushWord(end: Int): Unit = {
      if (end > w0) encodeWord(s.substring(w0, end), ranks, out)
      ()
    }
    while (i < s.length) {
      if (Character.isWhitespace(s.charAt(i))) { flushWord(i); w0 = i + 1 }
      i += 1
    }
    flushWord(s.length)
    new GenericArrayData(out.toArray[Any])
  }

  private def rankOf(ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]],
      l: String, r: String): Int = {
    val inner = ranks.get(l)
    if (inner == null) Int.MaxValue
    else {
      val v = inner.get(r)
      if (v == null) Int.MaxValue else v.intValue()
    }
  }

  private def encodeWord(word: String,
      ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]],
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    // initial symbols: Unicode code points
    var parts = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b
    }
    var done = parts.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = rankOf(ranks, parts(i), parts(i + 1))
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        // merge ALL occurrences of that pair, leftmost-greedy
        val l = parts(bi)
        val r = parts(bi + 1)
        val merged = l + r
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == l && parts(j + 1) == r) {
            next += merged; j += 2
          } else { next += parts(j); j += 1 }
        }
        parts = next
        done = parts.length < 2
      }
    }
    parts.foreach(p => out += UTF8String.fromString(p))
  }
}
