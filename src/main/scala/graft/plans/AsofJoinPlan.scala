package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, EmptyBlock, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** The full custom-operator ladder (SURVEY preference (c)) for the
  * backward as-of join: a logical node, a column-pruning optimizer
  * rule, a planner strategy, and a physical operator that merges the
  * two sorted sides in one streaming pass per partition.
  *
  * Compared to the composed union+window form
  * ([[graft.operators.AsofJoin.backward]]), the native operator never
  * doubles the row stream through the shuffle and keeps O(1) state per
  * key — the left side flows through untouched and the right side is
  * consumed exactly once.
  *
  * Requirements declared to the planner, not hand-scheduled: both
  * children hash-clustered on the key (EnsureRequirements co-partitions
  * them) and sorted by (key, time[, tiebreaks]); at equal times the
  * last right row in tiebreak order wins, matching DuckDB ASOF `>=`
  * semantics. Join keys and times must be non-null (the engine's
  * sources guarantee both); a violating row fails fast with
  * [[AsofJoinExec.nullInputError]] in BOTH execution paths, instead of
  * diverging into an NPE (codegen) or a silent sentinel conflation
  * (interpreted).
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    payload: Expression, rightTieBreak: Seq[Expression],
    asOfAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asOfAttr
  override def producedAttributes: AttributeSet = AttributeSet(asOfAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** The built-in ColumnPruning rule does not know custom nodes, so the
  * right side would otherwise scan every column: keep only the key,
  * time, payload and tiebreak columns. (The left side's full output is
  * part of the operator's output, so there is nothing to prune there —
  * pruning above the node prunes through it naturally.) */
object PruneAsofRightColumns extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case n: AsofJoinNode =>
      val needed = AttributeSet(
        Seq(n.rightKey, n.rightTime, n.payload) ++ n.rightTieBreak)
      if (n.right.output.forall(needed.contains)) n
      else n.copy(right = Project(n.right.output.filter(needed.contains), n.right))
  }
}

/** The as-of join emits exactly one output row per left row, so a
  * deterministic predicate over left-side attributes commutes with the
  * join: push it below the node and its rows never reach the shuffle.
  * (Built-in PushDownPredicates skips unknown nodes.) Predicates
  * touching the as-of column or mixing sides stay above. */
object PushFilterThroughAsof extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsofJoinNode) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, p, tb, attr) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p, tb, attr) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    payload: Expression, rightTieBreak: Seq[Expression],
    asOfAttr: AttributeReference) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output :+ asOfAttr
  override def producedAttributes: AttributeSet = AttributeSet(asOfAttr)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // ---- whole-stage codegen -------------------------------------------
  // Like SortMergeJoinExec, this operator is a produce boundary: it
  // reads both children's row iterators directly in generated code and
  // runs the same O(1)-state merge walk as doExecute, but with key/time
  // extraction, comparisons, the payload copy and the output projection
  // all compiled into the WholeStageCodegen stage — no per-row
  // interpreted `eval` on the hot path. doExecute below remains the
  // interpreted fallback (codegen disabled / compile failure).

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output rows reference the reused left-iterator buffer; let the
  // stage boundary copy them (same contract as SortMergeJoinExec)
  override def needCopyResult: Boolean = true

  // legitimate for a node that reads its input RDDs directly
  override def canCheckLimitNotReached: Boolean = true

  protected override def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    // lookahead right row; null = consumed (fetch the next) or exhausted
    val rightRow = ctx.addMutableState("InternalRow", "asofRightRow")
    val hasPrev = ctx.addMutableState("boolean", "asofHasPrevKey")
    val hasMatch = ctx.addMutableState("boolean", "asofHasMatch")
    val payloadNull = ctx.addMutableState("boolean", "asofPayloadNull")

    // left-side extractors + output columns, evaluated on the streamed row
    val leftRow = ctx.freshName("asofLeftRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val lk = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val lt = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    // addBufferedState copies across iterator buffer reuse (clone for
    // UTF8String, copy for struct/array, plain assign for primitives)
    val prevKey = ctx.addBufferedState(leftKey.dataType, "asofPrevKey", s"${lk.value}")
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    // right-side extractors, evaluated on the buffered lookahead row
    ctx.INPUT_ROW = rightRow
    val rk = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rt = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val p = BindReferences.bindReference(payload, right.output).genCode(ctx)
    val lastPayload = ctx.addBufferedState(payload.dataType, "asofPayload", s"${p.value}")

    // contract guard: a null key/time (only reachable via contract-
    // violating input to AsofJoin.backwardNative) fails fast with the
    // same error as the interpreted path — not an NPE from genComp, nor
    // a silent first-row-sentinel conflation
    val nullErrLit = "\"" + AsofJoinExec.nullInputError + "\""
    val advancing = ctx.freshName("asofAdvancing")
    val kc = ctx.freshName("asofKeyComp")
    val take = ctx.freshName("asofTake")
    val outIsNull = ctx.freshName("asofOutIsNull")
    val outVal = ctx.freshName("asofOutVal")
    val asofVar = ExprCode(EmptyBlock,
      JavaCode.isNullVariable(outIsNull),
      JavaCode.variable(outVal, payload.dataType))
    val numOutput = metricTerm(ctx, "numOutputRows")

    s"""
       |while ($limitNotReachedCond $leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lk.code}
       |  ${lt.code}
       |  if (${lk.isNull} || ${lt.isNull}) {
       |    throw new RuntimeException($nullErrLit);
       |  }
       |  if (!$hasPrev || ${ctx.genComp(leftKey.dataType, s"${lk.value}", s"${prevKey.value}")} != 0) {
       |    ${prevKey.code}
       |    $hasPrev = true;
       |    $hasMatch = false;
       |    $payloadNull = true;
       |  }
       |  boolean $advancing = true;
       |  while ($advancing) {
       |    if ($rightRow == null) {
       |      if (!$rightInput.hasNext()) break;
       |      $rightRow = (InternalRow) $rightInput.next();
       |    }
       |    ${rk.code}
       |    if (${rk.isNull}) {
       |      throw new RuntimeException($nullErrLit);
       |    }
       |    int $kc = ${ctx.genComp(leftKey.dataType, s"${rk.value}", s"${lk.value}")};
       |    boolean $take = false;
       |    if ($kc < 0) {
       |      $take = true;
       |    } else if ($kc == 0) {
       |      ${rt.code}
       |      if (${rt.isNull}) {
       |        throw new RuntimeException($nullErrLit);
       |      }
       |      if (${ctx.genComp(leftTime.dataType, s"${rt.value}", s"${lt.value}")} <= 0) {
       |        $take = true;
       |        // the most recent right ROW wins, even with a null payload
       |        ${p.code}
       |        $payloadNull = ${p.isNull};
       |        if (!$payloadNull) {
       |          ${lastPayload.code}
       |        }
       |        $hasMatch = true;
       |      }
       |    }
       |    if ($take) { $rightRow = null; } else { $advancing = false; }
       |  }
       |  $numOutput.add(1);
       |  boolean $outIsNull = !$hasMatch || $payloadNull;
       |  ${CodeGenerator.javaType(payload.dataType)} $outVal = ${lastPayload.value};
       |  ${consume(ctx, leftVars :+ asofVar)}
       |  $shouldStopCheckCode
       |}
     """.stripMargin
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey; val lTimeExpr = leftTime
    val rKeyExpr = rightKey; val rTimeExpr = rightTime
    val pExpr = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(lKeyExpr, lOut)
      val lTime = BindReferences.bindReference(lTimeExpr, lOut)
      val rKey = BindReferences.bindReference(rKeyExpr, rOut)
      val rTime = BindReferences.bindReference(rTimeExpr, rOut)
      val pEval = BindReferences.bindReference(pExpr, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lKeyExpr.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(lTimeExpr.dataType)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val payloadRow = new GenericInternalRow(1)
      val rBuf = rIter.buffered

      var prevKey: Any = null        // left key currently being walked (copied)
      var lastPayload: Any = null    // payload of latest matching right row
      var hasMatch = false

      lIter.map { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTime.eval(lRow)
        if (lk == null || lt == null)
          throw new RuntimeException(AsofJoinExec.nullInputError)
        if (prevKey == null || keyOrd.compare(lk, prevKey) != 0) {
          prevKey = InternalRow.copyValue(lk)
          lastPayload = null
          hasMatch = false
        }
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val rk = rKey.eval(head)
          if (rk == null) throw new RuntimeException(AsofJoinExec.nullInputError)
          val kc = keyOrd.compare(rk, lk)
          lazy val rt = {
            val t = rTime.eval(head)
            if (t == null) throw new RuntimeException(AsofJoinExec.nullInputError)
            t
          }
          if (kc < 0 || (kc == 0 && timeOrd.compare(rt, lt) <= 0)) {
            val consumed = rBuf.next()
            if (kc == 0) {
              // the most recent right ROW wins, even with a null payload
              lastPayload = InternalRow.copyValue(pEval.eval(consumed))
              hasMatch = true
            }
          } else advancing = false
        }
        payloadRow.update(0, if (hasMatch) lastPayload else null)
        numOutputRows += 1
        resultProj(joined(lRow, payloadRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinExec {
  /** Contract-violation message shared by the codegen and interpreted
    * paths, so bad input fails the same way regardless of which path
    * the planner picked. */
  val nullInputError: String =
    "graft as-of join: null key or time in input (contract: key and time are non-null)"
}
