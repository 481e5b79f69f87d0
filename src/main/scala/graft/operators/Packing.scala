package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums for sequential packing operations.
  *
  * A naive global running total — `Window.orderBy(...)` with no
  * partition — collapses the whole dataset into ONE task, the classic
  * scale killer. The textbook fix is the two-phase prefix sum: bin rows
  * into order-key ranges, local window cumsum inside each bin, then add
  * each bin's broadcast offset (the sum of all earlier bins). Every
  * phase stays parallel: the only global window runs over one row per
  * BIN.
  */
object Packing {

  /** Adds `cumCol` = inclusive running total of `valueCol` in
    * `orderCol` order. `orderCol` must be numeric and unique (e.g. a
    * doc id).
    *
    * The range bins are an explicit EXPRESSION over the order key,
    * binned against approximate quantiles computed once on the driver
    * (a bounded `partitions`-sized list). This keeps the bin id
    * deterministic for a row no matter which plan branch evaluates it —
    * a `repartitionByRange` + `spark_partition_id` formulation would
    * silently depend on the optimizer reusing one exchange for both the
    * cumsum and the offsets branch, and column pruning can break that
    * subtree identity while each non-reused range exchange samples its
    * boundaries with a different seed. */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
                       cumCol: String, partitions: Int = 32,
                       totalCol: Option[String] = None,
                       materializeInput: Boolean = false): DataFrame = {
    // `materializeInput` — measured BOTH ways at sf0.1 AND sf1
    // (optimization r18). The shape consumes `df` three times (driver
    // quantile sample, cumsum branch, offsets branch). When the input
    // is already a shuffle-reduced frame (q149: one row per distinct
    // value), a localCheckpoint wins at every scale (sf0.1 3.62 ->
    // 2.23 s, sf1 4.87 -> 4.28 s) because re-deriving it re-runs a
    // scan + aggregation per consumer. When the input is a narrow
    // map-heavy pipeline (q63/q64/q168's per-doc token counts, with a
    // tokenizer pass embedded), the checkpoint LOSES (q168 0.92 ->
    // 2.05 s at sf1): the duplicated branches stream through codegen
    // concurrently, while materialization serializes them behind a
    // barrier. Callers choose; default is the lazy form.
    val mat = if (materializeInput) df.localCheckpoint() else df
    val probs = (1 until partitions).map(_.toDouble / partitions).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else mat.stat.approxQuantile(orderCol, probs, 0.001)
    val bin = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) > lit(b), 1).otherwise(0)
    }
    val parted = mat.withColumn("_pid", bin)
    val wLocal = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_local", sum(col(valueCol)).over(wLocal))
    // one row per bin; the global windows here are over <= `partitions`
    // rows. `totalCol` (when asked for) rides the SAME broadcast frame:
    // the grand total is the sum of every bin's partial, so a caller
    // that needs it (q149's bucket arithmetic) no longer re-derives the
    // whole prefix-sum subtree for a one-row aggregate.
    val wOff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val partials = parted.groupBy("_pid").agg(sum(col(valueCol)).as("_psum"))
      .withColumn("_off", coalesce(sum("_psum").over(wOff), lit(0L)))
    val offsets = totalCol.fold(partials.select("_pid", "_off")) { tc =>
      partials.withColumn(tc, sum("_psum").over(wAll))
        .select("_pid", "_off", tc)
    }
    local.join(broadcast(offsets), "_pid")
      .withColumn(cumCol, col("_local") + col("_off"))
      .drop("_pid", "_local")
  }

  /** Greedy sequential token-budget packing over ANY token count:
    * rows in `orderCol` order are assigned
    * bin = floor(exclusive-cumsum(countCol) / budget) — the
    * deterministic batch-assembly shape (q64), factored so the budget
    * unit is the caller's choice: whitespace counts (q64) or real
    * BPE-tokenizer counts (q168) pack through the identical
    * distributed prefix sum. Output: one row per bin with
    * (n_docs, total_tokens, first_doc, last_doc). */
  def packByBudget(counts: DataFrame, orderCol: String, countCol: String,
                   budget: Long): DataFrame =
    withRunningTotal(counts, orderCol, countCol, "cum")
      .withColumn("bin", ((col("cum") - col(countCol)) / budget).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(countCol).as("total_tokens"),
        min(orderCol).as("first_doc"), max(orderCol).as("last_doc"))
}
