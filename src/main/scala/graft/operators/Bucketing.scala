package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-located joins: writing both fact tables bucketed
  * (and sorted) by the join key lets a sort-merge join run with NO
  * exchange on either side — at 100 TB this is the difference between
  * re-shuffling petabytes per join and reading pre-organized buckets.
  * Bucketed layouts require the session catalog (`saveAsTable`).
  */
object Bucketing {

  /** Persist `df` as a managed table bucketed+sorted by `keys`. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the co-location check for bucket-aligned joins. */
  def isShuffleFree(df: DataFrame): Boolean = {
    df.collect() // finalize any adaptive plan first
    val plan = df.queryExecution.executedPlan
    !plan.toString.contains("Exchange hashpartitioning")
  }
}
