package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Idempotent price-series load (SURVEY §2.11 Q14; ref src/etl.py:46-65):
  * the reference's `UNIQUE(ticker,ts)` + `INSERT OR IGNORE` becomes
  * within-batch dedup + left-anti against the existing table + append —
  * the standard Spark merge shape (at 100 TB the anti-join prunes via
  * partitioned parquet / Delta MERGE; existing side shuffles once on the
  * key).
  */
object EtlQueries {

  /** Dedup a new batch on (ticker, ts) keeping the lowest-id row, drop
    * keys already present, and union with the existing table. */
  def dedupMerge(existing: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy("ticker", "ts").orderBy("event_id")
    val kept = batch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .join(existing, Seq("ticker", "ts"), "left_anti")
    existing.select("ticker", "ts", "close")
      .union(kept.select("ticker", "ts", "close"))
  }

  /** MERGE upsert: batch rows UPDATE the payload of matching keys and
    * INSERT new keys — the Delta-style `MERGE WHEN MATCHED THEN UPDATE
    * WHEN NOT MATCHED THEN INSERT`, as one full-outer join + coalesce
    * (each side shuffles once on the key; at 100 TB the existing side
    * prunes by partition exactly like [[dedupMerge]]). Within-batch dup
    * keys keep the lowest event_id row. */
  def mergeUpsert(existing: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy("ticker", "ts").orderBy("event_id")
    val b = batch.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("ticker"), col("ts"), col("close").as("b_close"))
    existing.select("ticker", "ts", "close")
      .join(b, Seq("ticker", "ts"), "full_outer")
      .select(col("ticker"), col("ts"),
        coalesce(col("b_close"), col("close")).as("close"))
  }

  /** Q50: upsert a batch that updates a third of existing keys (+10 on
    * close) and inserts new keys (ts shifted +40 days). */
  def q50MergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val existing = Tables.prices(spark, sfDir)
    val batch = existing.filter(col("event_id") % 3 === 0)
      .withColumn("ts", when(col("event_id") % 2 === 0,
        col("ts") + expr("INTERVAL 40 DAYS")).otherwise(col("ts")))
      .withColumn("close", col("close") + 10.0)
    mergeUpsert(existing, batch).orderBy("ticker", "ts", "close")
  }

  /** Q14: replay a batch that is 50% duplicates of existing keys and 50%
    * genuinely new rows (ts shifted +40 days); merged result must equal
    * existing + new only. */
  def q14EtlDedupLoad(spark: SparkSession, sfDir: String): DataFrame = {
    val existing = Tables.prices(spark, sfDir)
    val batch = existing.filter(col("event_id") % 3 === 0)
      .withColumn("ts", when(col("event_id") % 2 === 0,
        col("ts") + expr("INTERVAL 40 DAYS")).otherwise(col("ts")))
    dedupMerge(existing, batch).orderBy("ticker", "ts", "close")
  }

  val oracle: Map[String, String] = Map(
    "q50_merge_upsert" ->
      """WITH existing AS (
        |  SELECT event_type AS ticker, ts, value AS close, event_id FROM events),
        |batch AS (
        |  SELECT ticker,
        |         CASE WHEN event_id % 2 = 0 THEN ts + INTERVAL 40 DAY ELSE ts END AS ts,
        |         close + 10.0 AS close, event_id
        |  FROM existing WHERE event_id % 3 = 0),
        |b AS (
        |  SELECT ticker, ts, close FROM (
        |    SELECT *, row_number() OVER (PARTITION BY ticker, ts ORDER BY event_id) AS rn
        |    FROM batch) WHERE rn = 1)
        |SELECT ticker, ts, COALESCE(b.close, e.close) AS close
        |FROM existing e FULL OUTER JOIN b USING (ticker, ts)
        |ORDER BY ticker, ts, close""".stripMargin,

    "q14_etl_dedup_load" ->
      """WITH existing AS (
        |  SELECT event_type AS ticker, ts, value AS close, event_id FROM events),
        |batch AS (
        |  SELECT ticker,
        |         CASE WHEN event_id % 2 = 0 THEN ts + INTERVAL 40 DAY ELSE ts END AS ts,
        |         close, event_id
        |  FROM existing WHERE event_id % 3 = 0),
        |kept AS (
        |  SELECT ticker, ts, close FROM (
        |    SELECT *, row_number() OVER (PARTITION BY ticker, ts ORDER BY event_id) AS rn
        |    FROM batch) b
        |  WHERE rn = 1
        |    AND NOT EXISTS (SELECT 1 FROM existing e
        |                    WHERE e.ticker = b.ticker AND e.ts = b.ts))
        |SELECT ticker, ts, close FROM existing
        |UNION ALL
        |SELECT ticker, ts, close FROM kept
        |ORDER BY ticker, ts, close""".stripMargin
  )
}
