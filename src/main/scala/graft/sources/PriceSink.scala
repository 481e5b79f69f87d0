package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The prices ETL boundary (SURVEY §2.1): wide provider frame -> tidy
  * long frame (S3 melt), timestamp normalization (S4), idempotent
  * dedup-merge append into partitioned parquet (S5 — the reference's
  * UNIQUE(ticker,ts) + INSERT OR IGNORE, ref etl.py:46-65), and the
  * fallback-chain read (S8, ref 2_Trades.py:24-74).
  *
  * Scale shape: the sink partitions by month so the anti-join prunes to
  * the months present in the incoming batch (at 100 TB the existing
  * side is read only where new data lands), and appends never rewrite
  * history.
  */
object PriceSink {

  /** S3: wide provider frame (ts + one column per ticker) -> tidy
    * (ts, ticker, close), dropping null closes (ref etl.py:31-43). */
  def melt(wide: DataFrame, tsCol: String = "ts"): DataFrame = {
    val tickers = wide.columns.filter(_ != tsCol)
    wide.unpivot(Array(col(tsCol)), tickers.map(col), "ticker", "close")
      .na.drop(Seq("close"))
      .select(col(tsCol).as("ts"), col("ticker"), col("close"))
  }

  /** S1 column preference: adjusted close if present else close
    * (ref etl.py:32,37). */
  def preferAdjusted(df: DataFrame): DataFrame =
    if (df.columns.contains("adj_close"))
      df.withColumn("close", coalesce(col("adj_close"), col("close"))).drop("adj_close")
    else df

  /** S5: idempotent append of a batch into a month-partitioned parquet
    * prices table. Within-batch dup keys keep the first row in
    * (ticker, ts) order; keys already stored are ignored. Returns the
    * number of rows actually appended (the reference returns tried-
    * insert count; appended-count is the useful telemetry). */
  def appendDedup(spark: SparkSession, tablePath: String, batch: DataFrame): Long = {
    import org.apache.spark.sql.expressions.Window
    val withMonth = batch
      .select(col("ticker"), col("ts"), col("close"))
      .withColumn("month", date_format(col("ts"), "yyyy-MM"))
    val w = Window.partitionBy("ticker", "ts").orderBy("close")
    val deduped = withMonth
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val exists = new java.io.File(tablePath).exists
    val toWrite = if (!exists) deduped else {
      val months = deduped.select("month").distinct().collect().map(_.getString(0))
      // partition pruning: only months touched by the batch are read
      val existing = spark.read.parquet(tablePath)
        .filter(col("month").isin(months.toSeq: _*))
        .select("ticker", "ts")
      deduped.join(existing, Seq("ticker", "ts"), "left_anti")
    }
    // the appended-row count rides the WRITE job as an observed metric
    // (optimization r18): the previous cache().count() + write ran two
    // actions over the frame per batch — at 100 TB the count pass is a
    // second full scan of the novel rows, and in a micro-batch loop
    // (q31) it doubled the per-batch action count
    val obs = org.apache.spark.sql.Observation()
    toWrite.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).partitionBy("month").parquet(tablePath)
    obs.get("n").asInstanceOf[Long]
  }

  /** Stored prices reader over the sink layout. */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath).select("ticker", "ts", "close")

  /** S8 fallback chain: latest close per ticker from the live frame
    * where present, else from the stored table — a declarative coalesce
    * over sources replacing the reference's try/except ladder. */
  def latestWithFallback(live: DataFrame, stored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def latest(df: DataFrame, valName: String): DataFrame = {
      val w = Window.partitionBy("ticker").orderBy(col("ts").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("ticker"), col("close").as(valName))
    }
    latest(stored, "stored_close")
      .join(latest(live, "live_close"), Seq("ticker"), "full_outer")
      .select(col("ticker"),
        coalesce(col("live_close"), col("stored_close")).as("last_close"))
  }
}
