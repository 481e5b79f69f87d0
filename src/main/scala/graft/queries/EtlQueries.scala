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

  /** SCD Type-2 history build: collapse a change log `(key, ts, attr)`
    * into validity intervals — one row per run of an unchanged attribute
    * value, `[effective_from, effective_to)` half-open, `effective_to`
    * null on the open (current) row. The warehouse dimension-history
    * shape (ref tracks only current state, db.py — this is its temporal
    * upgrade). Plan: ONE shuffle on the key; the change-detect lag, the
    * run filter, and the interval lead all share that single
    * exchange+sort (filter preserves partitioning and order, so
    * EnsureRequirements inserts nothing between the two Window nodes).
    * At 100 TB this is the minimal-movement plan: no self-join, no
    * second shuffle, state per key is O(1). */
  def scd2(changes: DataFrame, key: String, ts: String, tiebreak: String,
           attr: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes
      .withColumn("prev_attr", lag(col(attr), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attr))
      .withColumn("effective_to", lead(col(ts), 1).over(w))
      .select(col(key), col(attr),
        col(ts).as("effective_from"), col("effective_to"),
        col("effective_to").isNull.cast("long").as("is_current"))
  }

  /** Q77: SCD2 over the events change log — `event_type` is the tracked
    * attribute per `user_id`, ordered by (ts, event_id). */
  def q77Scd2History(spark: SparkSession, sfDir: String): DataFrame =
    scd2(Tables.events(spark, sfDir), "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "effective_from")

  /** Snapshot reconciliation: classify every key across two versions of
    * a table as added / removed / changed / unchanged. Each side is
    * reduced to `(key, md5 content hash)` AT THE SCAN, so the full-outer
    * join shuffles 16-byte digests instead of full rows — the
    * anti-entropy audit shape for replicated 100 TB stores, where the
    * question is "what drifted" and the answer must not cost a
    * full-row shuffle of both copies. Nulls hash distinctly from empty
    * strings (sentinel coalesce). Hash equality stands in for row
    * equality; the q85 oracle compares the fields themselves, so a
    * collision or serialization drift would fail the hash-match. */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    def hashed(df: DataFrame, k: String, h: String) = {
      val content = df.columns.filterNot(_ == key).sorted
        .map(c => coalesce(col(c).cast("string"), lit("\u0000")))
      df.select(col(key).as(k),
        md5(concat_ws("\u0001", content: _*)).as(h))
    }
    hashed(oldDf, "k_old", "h_old")
      .join(hashed(newDf, "k_new", "h_new"),
        col("k_old") === col("k_new"), "full_outer")
      .select(coalesce(col("k_old"), col("k_new")).as(key),
        when(col("k_old").isNull, "added")
          .when(col("k_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("diff_class"))
  }

  /** q85: version reconciliation over orders — the new snapshot drops
    * every 97th key, bumps the price of every 13th, and re-keys every
    * 101st to a fresh id range. tableDiff's class counts must match the
    * oracle's direct field-by-field comparison. Prices ride as
    * micro-longs so the hashed strings are integer-exact across
    * engines. */
  def q85TableDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 1e6).cast("long").as("price_micro"),
        col("o_orderpriority"))
    val nu = o.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("price_micro",
        when(col("o_orderkey") % 13 === 0, col("price_micro") + 1000000L)
          .otherwise(col("price_micro")))
      .unionByName(o.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    tableDiff(o, nu, "o_orderkey")
      .groupBy("diff_class")
      .agg(count(lit(1)).as("n"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .orderBy("diff_class")
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
    "q85_table_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(ROUND(o_totalprice*1000000.0) AS BIGINT) AS price_micro,
        |         o_orderpriority
        |  FROM orders),
        |nu AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 13 = 0 THEN price_micro + 1000000
        |              ELSE price_micro END AS price_micro,
        |         o_orderpriority
        |  FROM o WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, price_micro, o_orderpriority
        |  FROM o WHERE o_orderkey % 101 = 0),
        |d AS (
        |  SELECT COALESCE(o.o_orderkey, nu.o_orderkey) AS k,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |              WHEN nu.o_orderkey IS NULL THEN 'removed'
        |              WHEN o.o_custkey = nu.o_custkey
        |                AND o.price_micro = nu.price_micro
        |                AND o.o_orderpriority = nu.o_orderpriority THEN 'unchanged'
        |              ELSE 'changed' END AS diff_class
        |  FROM o FULL OUTER JOIN nu ON o.o_orderkey = nu.o_orderkey)
        |SELECT diff_class, COUNT(*) AS n,
        |       MIN(k) AS min_key, MAX(k) AS max_key
        |FROM d GROUP BY diff_class ORDER BY diff_class""".stripMargin,

    "q77_scd2_history" ->
      """WITH c AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        |  FROM events),
        |ch AS (
        |  SELECT * FROM c WHERE prev_attr IS NULL OR prev_attr <> event_type)
        |SELECT user_id, event_type, ts AS effective_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
        |       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS BIGINT) AS is_current
        |FROM ch
        |ORDER BY user_id, effective_from""".stripMargin,

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
