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
           attr: String): DataFrame =
    scd2Keyed(changes, key, ts, tiebreak, attr).drop("_tb")

  /** [[scd2]] retaining the ordering tiebreak as `_tb` on every
    * interval row — the anchor [[scd2Apply]] needs to replay the open
    * run against a later batch with the ORIGINAL total order, so an
    * incremental apply reproduces exactly what a full rebuild would. */
  def scd2Keyed(changes: DataFrame, key: String, ts: String, tiebreak: String,
                attr: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes
      .withColumn("prev_attr", lag(col(attr), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attr))
      .withColumn("effective_to", lead(col(ts), 1).over(w))
      .select(col(key), col(attr),
        col(ts).as("effective_from"), col("effective_to"),
        col("effective_to").isNull.cast("long").as("is_current"),
        col(tiebreak).cast("long").as("_tb"))
  }

  /** Incremental SCD2 maintenance: fold an arriving change batch into
    * an existing interval history WITHOUT rebuilding it — the 100 TB
    * form, where the history is years of stored intervals and the
    * batch is one day. Only three slices move: rows for untouched keys
    * pass through by anti-join; affected keys' CLOSED intervals pass
    * through (a later batch can never alter a closed run); each
    * affected key's OPEN row is turned back into a change record
    * (its original (ts, tiebreak) anchor preserved via `_tb`) and
    * replayed with the batch through the same [[scd2Keyed]] fold — the
    * lag change-detect sees the open run's attribute first, so an
    * unchanged attribute EXTENDS the run (no new interval) and a
    * changed one closes it at the batch row's timestamp, exactly as a
    * full rebuild would. Requires batch events at/after each key's
    * open-run anchor (append-only in event time); late data belongs to
    * the q96 CDC path or a rebuild.
    *
    * The recompute's shuffle is sized by |affected keys' open rows| +
    * |batch|, never by the history — the invariant (incremental ==
    * full rebuild) is what q138's oracle checks, since the oracle
    * recomputes from the full log while the engine applies
    * incrementally. */
  def scd2Apply(history: DataFrame, batch: DataFrame, key: String, ts: String,
                tiebreak: String, attr: String): DataFrame = {
    val keys = batch.select(col(key)).distinct()
    val untouched = history.join(keys, Seq(key), "left_anti")
    val affected = history.join(keys, Seq(key), "left_semi")
    val closed = affected.filter(col("is_current") === 0)
    val reopened = affected.filter(col("is_current") === 1)
      .select(col(key), col("effective_from").as(ts),
        col("_tb").as(tiebreak), col(attr))
    val miniLog = reopened.unionByName(
      batch.select(col(key), col(ts), col(tiebreak).cast("long").as(tiebreak),
        col(attr)))
    untouched.unionByName(closed)
      .unionByName(scd2Keyed(miniLog, key, ts, tiebreak, attr))
  }

  /** Q77: SCD2 over the events change log — `event_type` is the tracked
    * attribute per `user_id`, ordered by (ts, event_id). */
  def q77Scd2History(spark: SparkSession, sfDir: String): DataFrame =
    scd2(Tables.events(spark, sfDir), "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "effective_from")

  /** q138: incremental SCD2 apply, proven equal to the full rebuild —
    * the history is built from the first ~24 days of the change log,
    * the final days arrive as a batch, [[scd2Apply]] folds them in
    * touching only affected open rows + the batch, and the ORACLE
    * recomputes the whole history from the full log: a hash match IS
    * the incremental-equals-rebuild invariant, checked cross-engine. */
  def q138Scd2Apply(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val cut = expr("TIMESTAMP '2024-01-25 00:00:00'")
    val hist = scd2Keyed(ev.filter(col("ts") < cut),
      "user_id", "ts", "event_id", "event_type")
    val batch = ev.filter(col("ts") >= cut)
    scd2Apply(hist, batch, "user_id", "ts", "event_id", "event_type")
      .drop("_tb")
      .orderBy("user_id", "effective_from")
  }

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

  /** CDC change-log apply: collapse an ordered stream of upserts and
    * deletes into final table state — the Debezium/Delta CDF
    * "apply changes" shape. The latest row per key wins; a key whose
    * latest op is a delete is absent from the result. Implemented as a
    * single `max_by(payload, version)` aggregation, NOT a window
    * `row_number`: PARTIAL aggregation folds each map task's rows down
    * to one candidate per key BEFORE the exchange, so at 100 TB the
    * shuffle carries one row per (task, key) instead of the whole
    * change log. (Struct-valued max_by buffers are immutable, so Spark
    * plans SortAggregate — a sort by GROUP KEY within each task, never
    * a per-key sort of versions; the map-side collapse and the single
    * exchange are unchanged, see docs/PLANS.md q96.) A change log with
    * heavy update churn (the common case: few keys, many versions)
    * collapses almost entirely map-side. */
  def cdcApply(log: DataFrame, keys: Seq[String], version: Seq[String],
               op: String, payload: Seq[String]): DataFrame = {
    val ver = struct(version.map(col): _*)
    val pay = struct((op +: payload).map(col): _*)
    log.groupBy(keys.map(col): _*)
      .agg(max_by(pay, ver).as("_last"))
      .filter(col(s"_last.$op") =!= "D")
      .select(keys.map(col) ++ payload.map(c => col(s"_last.$c").as(c)): _*)
  }

  /** q96: events as a CDC log — key (user_id, event_type), version
    * (ts, event_id), every 7th event a delete tombstone. Final state
    * must match the oracle's window-ranked replay. */
  def q96CdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val log = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        when(col("event_id") % 7 === 0, "D").otherwise("U").as("op"),
        round(col("value") * 1e6).cast("long").as("value_micro"))
    cdcApply(log, Seq("user_id", "event_type"), Seq("ts", "event_id"),
      "op", Seq("ts", "value_micro"))
      .withColumnRenamed("ts", "last_ts")
      .withColumnRenamed("value_micro", "last_value_micro")
      .orderBy("user_id", "event_type")
  }

  /** One micro-batch of CDC changes merged into a shard-partitioned
    * parquet state store (the foreachBatch body of q102 — shared here so
    * the batch and streaming paths use one merge). The state keeps the
    * LATEST row per key INCLUDING delete tombstones, partitioned by an
    * 8-way key hash shard:
    *
    *  1. the batch collapses to one row per key (partial max_by, as
    *     [[cdcApply]]);
    *  2. only the shards the batch touches are read back (directory
    *     pruning on the shard column) and merged, again by max_by on
    *     the version — ORDER-INDEPENDENT across batches, so replayed
    *     or out-of-order micro-batches converge to the same state;
    *  3. dynamic partition overwrite rewrites ONLY the touched shard
    *     directories (the q62 incremental-recompute shape).
    *
    * Tombstones must persist while a replay could still carry an older
    * upsert: dropping a 'D' row early would let it resurrect the key.
    * [[cdcVacuumTombstones]] ages them out once they clear the replay
    * horizon. (Production commits via snapshot dirs / a Delta log
    * rather than in-place overwrite; the localCheckpoint below
    * materializes the merge before the overwrite for the same
    * read-then-replace safety.) */
  def cdcMergeIntoStore(stateDir: String, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val shard = pmod(xxhash64(col("user_id"), col("event_type")), lit(8L))
    val ver = struct(col("ts"), col("event_id"))
    val pay = struct(col("ts"), col("event_id"), col("op"), col("value_micro"))
    def latest(df: DataFrame) =
      df.groupBy("user_id", "event_type", "shard")
        .agg(max_by(pay, ver).as("_l"))
        .select(col("user_id"), col("event_type"), col("_l.ts").as("ts"),
          col("_l.event_id").as("event_id"), col("_l.op").as("op"),
          col("_l.value_micro").as("value_micro"), col("shard"))
    val bLatest = latest(batch.withColumn("shard", shard))
    val hasState = new java.io.File(stateDir).isDirectory
    val merged = if (!hasState) bLatest else {
      val touched = bLatest.select("shard").distinct()
        .collect().map(_.getLong(0)) // bounded: <= 8 shard ids
      latest(spark.read.parquet(stateDir)
        .filter(col("shard").isin(touched: _*))
        .unionByName(bLatest))
    }
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.localCheckpoint().write.partitionBy("shard")
      .mode("overwrite").parquet(stateDir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  /** Tombstone aging for the CDC store: drop 'D' rows whose version
    * timestamp has cleared `horizon`. Past the pipeline's maximum
    * replay/out-of-order delay no in-flight batch can still carry an
    * OLDER upsert for the key, so the tombstone's shadowing job is done
    * — retaining it forever would grow the store by every key ever
    * deleted, which at 100 TB of churn is unbounded. Only shards that
    * actually hold expired tombstones are rewritten (the merge's
    * dynamic-partition-overwrite discipline); a shard left with zero
    * rows is physically reclaimed, since dynamic overwrite cannot
    * express "this partition is now empty".
    *
    * SAFETY CONTRACT (spec-demonstrated from both sides): `horizon`
    * must be at least the max replay delay — vacuuming younger
    * tombstones re-opens exactly the resurrection window the tombstone
    * existed to close. */
  def cdcVacuumTombstones(spark: SparkSession, stateDir: String,
                          horizon: java.sql.Timestamp): Unit = {
    if (!new java.io.File(stateDir).isDirectory) return
    val expiredPred = col("op") === "D" && col("ts") < lit(horizon)
    val state = spark.read.parquet(stateDir)
    // bounded driver metadata: <= 8 shard ids, like the merge's
    // pruning (cast: directory-inferred partition columns read as int)
    val touched = state.filter(expiredPred)
      .select(col("shard").cast("long")).distinct().collect().map(_.getLong(0))
    if (touched.isEmpty) return
    val kept = state.filter(col("shard").isin(touched.toIndexedSeq: _*))
      .filter(!expiredPred)
      .localCheckpoint()
    val emptied = touched.toSet --
      kept.select(col("shard").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try kept.write.partitionBy("shard").mode("overwrite").parquet(stateDir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    emptied.foreach { s =>
      val dir = java.nio.file.Paths.get(stateDir, s"shard=$s")
      if (java.nio.file.Files.exists(dir))
        java.nio.file.Files.walk(dir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  /** Incremental aggregate maintenance: a materialized aggregate is
    * stored as MERGEABLE PARTIALS (count + sum per group), and an
    * update folds only the delta batch into them — `agg(delta) ∪
    * stored → re-agg` — never rescanning the base table. This is the
    * materialized-view refresh shape for 100 TB fact tables: update
    * cost is O(|delta|) + a shuffle of pre-aggregated group rows
    * (bounded by group count, not row count). avg/stddev/etc. derive
    * from the same (n, sum, …) partials; only non-decomposable
    * aggregates (exact median) would force a rescan. */
  def incrementalAgg(partials: DataFrame, delta: DataFrame): DataFrame = {
    val deltaPartials = delta.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("value_micro").as("sum_micro"))
    partials.unionByName(deltaPartials)
      .groupBy("user_id", "event_type")
      .agg(sum("n_events").as("n_events"), sum("sum_micro").as("sum_micro"))
  }

  /** q99: the first 25 days of events are the materialized base state
    * (persisted to parquet and read back, as a real refresh would), the
    * rest arrive as the delta; the refreshed aggregate must equal a
    * full recompute over the whole table (the oracle). */
  def q99IncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"),
        round(col("value") * 1e6).cast("long").as("value_micro"))
    val split = lit("2024-01-25").cast("timestamp")
    val store = graft.sources.TempDirs
      .create("graft_q99").resolve("mv").toString
    ev.filter(col("ts") < split)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("value_micro").as("sum_micro"))
      .write.mode("overwrite").parquet(store)
    incrementalAgg(spark.read.parquet(store), ev.filter(col("ts") >= split))
      .orderBy("user_id", "event_type")
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

  /** q155: late-arriving dimension repair — the incremental-join
    * counterpart to q99/q138's incremental aggregates. At ingest time
    * only a partial dimension snapshot exists (here: two-thirds of
    * parts); facts that miss it are PARKED, not dropped and not
    * blocking the batch. When the dimension completes, the repair pass
    * joins ONLY the parked rows against it — the enriched majority is
    * never reprocessed, so repair cost scales with the dimension's
    * lateness, not the fact table. Park/enrich split is one left join +
    * a null test (one shuffle, both outputs from the same pass);
    * repair is a second join whose left side is the parked minority.
    * The oracle joins the COMPLETE tables directly — a hash match
    * proves parked ∪ enriched ∪ repaired loses nothing, double-counts
    * nothing, and enriches every row identically to a full rebuild. */
  def q155LateDimRepair(spark: SparkSession, sfDir: String): DataFrame = {
    val facts = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"))
    val fullDim = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_size").cast("long").as("p_size"))
    // the snapshot available at ingest time: two-thirds of the keys
    val earlyDim = fullDim.filter(pmod(col("p_partkey"), lit(3)) =!= 0)
    val firstPass = facts.join(broadcast(earlyDim),
      facts("l_partkey") === earlyDim("p_partkey"), "left")
    val enriched = firstPass.filter(col("p_partkey").isNotNull)
      .select(col("l_partkey"), col("qty"), col("p_size"))
    val parked = firstPass.filter(col("p_partkey").isNull)
      .select("l_partkey", "qty")
    val repaired = parked.join(broadcast(fullDim),
        parked("l_partkey") === fullDim("p_partkey"))
      .select(col("l_partkey"), col("qty"), col("p_size"))
    enriched.unionByName(repaired)
      .groupBy("p_size")
      .agg(count(lit(1)).as("n_lines"), sum("qty").as("sum_qty"))
      .orderBy("p_size")
  }

  val oracle: Map[String, String] = Map(
    // the oracle joins the complete tables in one go — parked ∪
    // enriched ∪ repaired must be indistinguishable from the rebuild
    "q155_late_dim_repair" ->
      """SELECT CAST(p_size AS BIGINT) AS p_size, COUNT(*) AS n_lines,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q96_cdc_apply" ->
      """WITH log AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |         CAST(ROUND(value*1000000.0) AS BIGINT) AS value_micro
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM log)
        |SELECT user_id, event_type, ts AS last_ts,
        |       value_micro AS last_value_micro
        |FROM ranked WHERE rn = 1 AND op = 'U'
        |ORDER BY user_id, event_type""".stripMargin,

    "q99_incremental_agg" ->
      """SELECT user_id, event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(ROUND(value*1000000.0) AS BIGINT)) AS BIGINT) AS sum_micro
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

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

    // the FULL-log rebuild — the engine applies the last days
    // incrementally; hash equality is the maintenance invariant
    "q138_scd2_apply" ->
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
