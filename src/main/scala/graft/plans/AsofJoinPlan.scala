package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
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
  * sources guarantee both).
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
    asOfAttr: AttributeReference) extends BinaryExecNode {

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
        if (prevKey == null || keyOrd.compare(lk, prevKey) != 0) {
          prevKey = InternalRow.copyValue(lk)
          lastPayload = null
          hasMatch = false
        }
        val lt = lTime.eval(lRow)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val rk = rKey.eval(head)
          val kc = keyOrd.compare(rk, lk)
          if (kc < 0 || (kc == 0 && timeOrd.compare(rTime.eval(head), lt) <= 0)) {
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
