package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums for sequential packing operations.
  *
  * A naive global running total — `Window.orderBy(...)` with no
  * partition — collapses the whole dataset into ONE task, the classic
  * scale killer. The textbook fix is the two-phase prefix sum: range
  * partition on the order key, local window cumsum inside each
  * partition, then add each partition's broadcast offset (the sum of
  * all earlier partitions). The result is identical to the global
  * window for any partition count — boundaries shift which rows share
  * a task, never the running totals — while every phase stays
  * parallel: the only global window runs over one row per PARTITION.
  */
object Packing {

  /** Adds `cumCol` = inclusive running total of `valueCol` in
    * `orderCol` order (order key must be unique, e.g. a doc id).
    *
    * The `local` and `offsets` branches read the SAME range exchange —
    * identical subtrees, so Spark's ReuseExchange (with or without AQE)
    * computes the partitioning once and both branches see the same
    * `spark_partition_id`. The final result is independent of where the
    * sampled range boundaries fall in any case; only the pid-keyed join
    * requires the two branches to agree, which reuse guarantees. */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
                       cumCol: String, partitions: Int = 32): DataFrame = {
    val parted = df.repartitionByRange(partitions, col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val wLocal = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_local", sum(col(valueCol)).over(wLocal))
    // one row per partition; the global window here is over <= `partitions` rows
    val wOff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("_pid").agg(sum(col(valueCol)).as("_psum"))
      .withColumn("_off", coalesce(sum("_psum").over(wOff), lit(0L)))
      .select("_pid", "_off")
    local.join(broadcast(offsets), "_pid")
      .withColumn(cumCol, col("_local") + col("_off"))
      .drop("_pid", "_local")
  }
}
