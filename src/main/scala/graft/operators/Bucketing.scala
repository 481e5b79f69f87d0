package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-located joins: writing both fact tables bucketed
  * (and sorted) by the join key lets a sort-merge join run with NO
  * exchange on either side — at 100 TB this is the difference between
  * re-shuffling petabytes per join and reading pre-organized buckets.
  * Bucketed layouts require the session catalog (`saveAsTable`).
  */
object Bucketing {

  /** Persist `df` as a table bucketed+sorted by `keys`. With `path` the
    * table is external (data at `path`), otherwise managed in the
    * session warehouse — the warehouse dir is a static config, so
    * callers that need a scratch location must pass `path`. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String],
                    path: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // Overwrite on an external bucketed table keeps the OLD location in
    // the catalog; drop first so the new path and layout win.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the co-location check for bucket-aligned joins. Drives THIS
    * QueryExecution's RDD with a row-discarding foreach (a
    * Dataset-level foreach/collect/write would plan a FRESH
    * QueryExecution and leave this one's adaptive plan unfinalized):
    * all stages execute so AQE settles, and nothing is pulled to the
    * driver — safe to call on a fact-table-sized frame. */
  def isShuffleFree(df: DataFrame): Boolean = {
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan
    !plan.toString.contains("Exchange hashpartitioning")
  }
}
