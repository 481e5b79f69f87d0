package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}

/** Spark 4 removed the public Column(Expression) constructor and moved
  * Dataset.ofRows behind the classic implementation; extension
  * libraries bridge through those converters, which are private[sql].
  * This is the only file that lives inside Spark's namespace, and it
  * only forwards.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  /** Waits (up to 2 minutes) until every queued listener event is
    * delivered — a metrics listener (e.g. SpillProbe's per-query spill
    * counter) may only read its accumulators after the bus is drained,
    * else late TaskEnd events land in the NEXT query's bucket. The
    * explicit timeout matters: the no-arg overload waits only ~10 s and
    * then THROWS, which under heavy spill pressure would crash the
    * probe mid-run. `listenerBus` is private[spark]; this forwarder is
    * why the file lives in Spark's namespace. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(120000L)
}
