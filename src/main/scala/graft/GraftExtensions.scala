package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.FloatVecDot

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions, planner strategies and optimizer rules. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * Surface: `float_vec_dot(a, b)` (codegen'd float-vector dot product,
  * SQL-callable) and the native as-of join
  * (graft.plans.AsofJoinNode/Exec + its right-side pruning rule).
  * `AsofJoin.backwardNative` also self-registers through
  * `spark.experimental` for sessions built without this class.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_vec_dot(a, b) takes two arguments")
        FloatVecDot(children.head, children(1))
      }))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsofRightColumns)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsof)
  }
}
