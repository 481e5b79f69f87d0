package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-stream queries beyond the reference surface: sessionization
  * (gap-based session windows via lag + running sum — the standard
  * partition-parallel shape) and semi-structured JSON extraction from
  * the `props` column.
  */
object EventsQueries {

  val SessionGapMicros: Long = 30L * 60 * 1000000 // 30 minutes

  /** q18: per-user sessions split on >30-minute gaps. One shuffle on
    * user_id; both windows share its sort. */
  def q18Sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("us") - lag("us", 1).over(w) > SessionGapMicros, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(cum))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("start_ts"), max("ts").as("end_ts"))
      .orderBy("user_id", "session_idx")
  }

  /** q56: sessionization via Spark's BUILT-IN `session_window`
    * aggregation — the codegen'd, merge-on-aggregate twin of q18 (and,
    * in streaming, the simple alternative to q45's
    * flatMapGroupsWithState walk, which remains necessary only for its
    * per-batch snapshot emission). The gap is 30 minutes + 1
    * microsecond: `session_window` opens a NEW session when the next
    * event lands exactly at the open window's end (closed-open
    * boundary), while q18's walk keeps an exact-gap event in the SAME
    * session (strictly-greater test); at microsecond resolution the
    * +1us makes the two conventions identical. start_ts/end_ts are
    * aggregated as min/max(ts) (the window's own end includes the
    * trailing gap); the ordinal session_idx is the per-user rank of the
    * session start. Same oracle as q18. */
  def q56SessionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val wIdx = Window.partitionBy("user_id").orderBy(col("start_ts").asc)
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes 1 microsecond"))
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("start_ts"), max("ts").as("end_ts"))
      .withColumn("session_idx", (row_number().over(wIdx) - 1).cast("long"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_ts"), col("end_ts"))
      .orderBy("user_id", "session_idx")
  }

  /** q19: typed extraction from the JSON props column, aggregated per
    * event type (exact integer sums). */
  def q19JsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** q58: the q19 extraction through Spark 4's VariantType — props is
    * parsed ONCE into the binary variant encoding and fields are read
    * with `variant_get` path extraction. Against repeated
    * `get_json_object` calls (each re-parses the string), the variant
    * form parses once per row and reads fields from the encoded form —
    * the right shape when a 100 TB pipeline extracts many fields from
    * the same semi-structured column. Same oracle as q19. */
  def q58VariantJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k",
        try_variant_get(parse_json(col("props")), "$.k", "long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** q61: batch time-range join through bucketed equi-keys. The naive
    * form — equi-join on ticker with the 2h range as a residual filter —
    * is correct but degenerate at scale: ticker has a handful of values,
    * so each join group is huge and the per-key work is
    * O(|L_k| x |R_k|) pair enumeration before the filter. Folding
    * floor(time / 2h) into the join key (the left probes its own bucket
    * and the previous one — the range spans at most two) makes the
    * equi-key fine-grained: per-bucket fan-out is bounded by the window,
    * independent of how much history a key accumulates. Batch twin of
    * q52's streaming join key; identical result and oracle. */
  def q61RangeJoinBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val bucketMicros = 2L * 3600 * 1000000
    val l = ev.filter(col("value") < 40)
      .select(col("event_id"), col("event_type").as("ticker"), col("ts"))
      .withColumn("bucket", explode(array(
        floor(unix_micros(col("ts")) / bucketMicros),
        floor(unix_micros(col("ts")) / bucketMicros) - 1)))
    val r = ev.filter(col("value") >= 150)
      .select(col("event_type").as("rticker"), col("ts").as("rts"),
        col("value").as("close"), col("event_id").as("rid"))
      .withColumn("rbucket", floor(unix_micros(col("rts")) / bucketMicros))
    l.join(r,
        col("ticker") === col("rticker") && col("bucket") === col("rbucket") &&
          col("rts") >= col("ts") - expr("INTERVAL 2 HOURS") &&
          col("rts") <= col("ts"))
      .select("event_id", "ticker", "ts", "rts", "close", "rid")
      .orderBy("event_id", "rid")
  }

  /** q38: backward as-of join — for every sparse "trade" event, the
    * most recent price observation (value >= 150 stream) at or before
    * it, per ticker. The Spark side is the composed one-shuffle window
    * form; the oracle uses DuckDB's native ASOF LEFT JOIN. */
  def q38AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val left = ev.filter(col("value") < 40)
      .select(col("event_id"), col("event_type").as("ticker"), col("ts"))
    val right = ev.filter(col("value") >= 150)
      .select(col("event_type").as("ticker"), col("ts").as("rts"),
        col("value").as("close"), col("event_id").as("rid"))
    graft.operators.AsofJoin.backward(left, right, "ticker", "ts", "rts",
        "close", "asof_close", Seq("rid"))
      .orderBy("event_id")
  }

  /** q47: the SAME as-of semantics as q38 but through the native
    * operator (graft.plans.AsofJoinExec — one streaming merge per
    * partition, no union row-doubling) on a different slice of events;
    * the oracle is again DuckDB's native ASOF LEFT JOIN. */
  def q47AsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val left = ev.filter(col("value") >= 40 && col("value") < 80)
      .select(col("event_id"), col("event_type").as("ticker"), col("ts"))
    val right = ev.filter(col("value") >= 120 && col("value") < 150)
      .select(col("event_type").as("ticker"), col("ts").as("rts"),
        col("value").as("close"), col("event_id").as("rid"))
    graft.operators.AsofJoin.backwardNative(left, right, "ticker", "ts", "rts",
        "close", "asof_close", Seq("rid"))
      .orderBy("event_id")
  }

  /** q88: time-RANGE rolling aggregation — per-ticker 7-day trailing
    * sum/count over the daily series, via `rangeBetween` on the day
    * number: the window covers VALUES within [day-6, day], not a fixed
    * row count, so gaps in the calendar shrink the window instead of
    * silently reaching further back — the semantics rowsBetween gets
    * wrong on sparse series. One shuffle on ticker; the daily rollup
    * and both range windows share its sort. Exact micro-long sums. */
  def q88RollingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.prices(spark, sfDir)
      .groupBy(col("ticker"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("close") * 1e6).cast("long")).as("cm"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy("ticker")
      .orderBy(datediff(col("day"), lit("1970-01-01")))
      .rangeBetween(-6, Window.currentRow)
    daily
      .select(col("ticker"), col("day"),
        (sum(col("cm")).over(w).cast("double") / 1e6).as("roll7_sum"),
        sum(col("n")).over(w).as("roll7_n"))
      .orderBy("ticker", "day")
  }

  /** q84: ordered funnel analysis — how many users progressed
    * view → click → purchase, each step STRICTLY after the previous
    * (earliest-progression semantics: the first view anchors the
    * funnel, the first later click advances it, the first later
    * purchase completes it). ONE shuffle on user_id, then the
    * [[graft.operators.Funnel]] streaming walk over secondary-sorted
    * partitions — O(1) state per in-flight user, so a hot key with 10⁸
    * events streams through instead of filling one aggregation buffer
    * (FunnelSpec proves the hot-key case and equivalence with the
    * buffered fold). No per-stage self-joins, no window cascade. The
    * oracle computes the identical stages via min-after-min joins —
    * equivalent because the fold's greedy anchors ARE those minima. */
  def q84Funnel(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Funnel.stages(
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        Seq("view", "click", "purchase"))
      .agg(
        sum(when(col("stage") >= 1, 1L).otherwise(0L)).as("n_stage1"),
        sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("n_stage2"),
        sum(when(col("stage") >= 3, 1L).otherwise(0L)).as("n_stage3"))

  /** q113: FIRST-TOUCH attribution — purchase value credited to the
    * event type that OPENED the session it happened in (the marketing
    * "which channel gets the credit" analysis). Composes q18's
    * gap-sessionization with a per-session `first` window and one
    * aggregation: sessions reuse the session_idx cumsum, the opener is
    * `first_value` over the in-session order, and the credit roll-up
    * is a plain groupBy — all on the SAME single per-user exchange
    * (one shuffle end-to-end until the tiny final combine). */
  def q113Attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("us") - lag("us", 1).over(w) > SessionGapMicros, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(cum))
    val sw = Window.partitionBy("user_id", "session_idx")
      .orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess
      .withColumn("first_touch", first("event_type").over(sw))
      .filter(col("event_type") === "purchase")
      .groupBy("first_touch")
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 1e6).cast("long")).as("credited_micro"))
      .orderBy("first_touch")
  }

  /** q114: retention cohorts — users grouped by first-seen day, counted
    * back on each later activity day as an offset from their cohort
    * (the product-analytics triangle). ONE user-keyed exchange carries
    * everything per-user: the cohort is `min(day)` as a WINDOW over the
    * user partition (not an aggregate joined back — that shape pays a
    * second user-keyed shuffle or a broadcast), and the per-(user,
    * cohort, offset) dedup that makes the count distinct runs on the
    * SAME partitioning with no new exchange, because hashpartitioning
    * on user_id already satisfies a clustered distribution on any key
    * set containing user_id. Only the final combine to the tiny
    * (days × offsets) matrix shuffles again. RetentionPlanSpec asserts
    * exactly one user-keyed exchange and zero joins. `count(*)` after
    * the dedup equals `count(DISTINCT user_id)` because cohort_day is
    * functionally dependent on user_id. */
  def q114RetentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort_day", min("day").over(byUser))
      .withColumn("day_offset",
        datediff(col("day"), col("cohort_day")).cast("long"))
      .dropDuplicates("user_id", "cohort_day", "day_offset")
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q111: POINT-IN-TIME join — every event enriched with the
    * dimension version that was valid AT ITS TIMESTAMP, against the
    * SCD2 interval history built by [[EtlQueries.scd2]] from a
    * downsampled change log (every 3rd event is a dimension change).
    * The half-open `[effective_from, effective_to)` intervals are
    * disjoint per key, so each event matches at most one version;
    * events before a user's first change stay null (left join). This
    * is the warehouse complement of the as-of join (q38/q47): as-of
    * picks the last OBSERVATION ≤ t from a point series, PIT probes an
    * INTERVAL table — the query every versioned-dimension lookup at
    * 100 TB compiles to. Plan: equi-key (user_id) hash join carries
    * the interval predicate as a post-join filter; per-key interval
    * counts are bounded (change-compressed history), so the per-key
    * cross-check is small — the same boundedness argument as q108. */
  def q111PitJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val hist = EtlQueries.scd2(ev.filter(col("event_id") % 3 === 0),
        "user_id", "ts", "event_id", "event_type")
      .select(col("user_id").as("h_user"), col("event_type").as("attr"),
        col("effective_from"), col("effective_to"))
    ev.join(hist,
        col("user_id") === col("h_user") &&
          col("ts") >= col("effective_from") &&
          (col("effective_to").isNull || col("ts") < col("effective_to")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts"), col("attr"))
      .orderBy("event_id")
  }

  /** q156: time-weighted average over an IRREGULAR series — the
    * right mean when observations arrive unevenly (a value that held
    * for an hour must outweigh one that held a millisecond; the naive
    * row mean is sampling-rate-biased). Per event type: each value
    * holds from its timestamp to the next (lead over the per-type
    * sequence), weight = holding micros, TWA = Σ v·Δt / Σ Δt in exact
    * integer arithmetic (value-micros × duration-micros → ppm at the
    * end, one integral division, both engines floor identically). One
    * exchange on event_type serves the lead window and the rollup (the
    * q145 subset rule); the last observation of a type has no
    * successor and contributes no interval — the standard
    * right-open integral. At 100 TB this is the telemetry
    * downsampling primitive: the integral is associative over
    * partitions once boundary rows are exchanged, and here the window
    * handles boundaries exactly. */
  def q156TimeWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"),
        round(col("value") * 1e6).cast("long").as("vm"))
      .repartition(col("event_type"))
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("vm"))
    // dt in MILLIS bounds each PRODUCT vm·dt inside Long (micros would
    // overflow per-element at fixture value scale), but the SUM of the
    // products is bounded by vmax·span — and span is a fixture
    // property: the round-17 sf10 sweep's span-extended events (100×
    // time range) pushed vmax·span to ~2.6e19, past Long.MAX, and the
    // Long sum raised ARITHMETIC_OVERFLOW under ANSI. The integral
    // therefore accumulates in DECIMAL(38,0) — exact at any scale the
    // way DuckDB's HUGEINT sum already was (the oracle never
    // overflowed; only the engine did), with identical results where
    // Long sufficed. The final `div` is integral division on both
    // engines (truncation toward zero, same as before).
    ev.withColumn("next_ts", lead("ts", 1).over(w))
      .filter(col("next_ts").isNotNull)
      .withColumn("dt_ms",
        expr("(unix_micros(next_ts) - unix_micros(ts)) div 1000"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_intervals"),
        sum("dt_ms").as("span_ms"),
        // cast a FACTOR before multiplying: decimal(38,0)·long widens to
        // decimal, so no Long product is ever formed — casting the
        // product's RESULT still ran the multiply in Long, which one
        // interval with gap ≳ Long.MAX/vmax (~2.9 years at vm~1e8)
        // overflowed per-element under ANSI before the cast applied
        sum(col("vm").cast("decimal(38,0)") * col("dt_ms")).as("integral"))
      .withColumn("twa_micro", expr("integral div span_ms"))
      .select("event_type", "n_intervals", "span_ms", "twa_micro")
      .orderBy("event_type")
  }

  val oracle: Map[String, String] = Map(
    // the oracle recomputes the right-open integral with its own
    // window lead — Σ v·Δt and the floor division must agree exactly
    "q156_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT event_type, ts,
        |         CAST(ROUND(value*1000000.0) AS BIGINT) AS vm
        |  FROM events),
        |x AS (
        |  SELECT event_type, vm,
        |    CAST(epoch_us(lead(ts) OVER (PARTITION BY event_type ORDER BY ts, vm)) -
        |         epoch_us(ts) AS BIGINT) // 1000 AS dt_ms
        |  FROM e)
        |SELECT event_type, COUNT(*) AS n_intervals,
        |       CAST(SUM(dt_ms) AS BIGINT) AS span_ms,
        |       CAST(SUM(vm * dt_ms) // SUM(dt_ms) AS BIGINT) AS twa_micro
        |FROM x WHERE dt_ms IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q113_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |         epoch_us(ts) AS us
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |                      > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |s AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m),
        |f AS (
        |  SELECT *, first_value(event_type) OVER (
        |              PARTITION BY user_id, session_idx ORDER BY us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch
        |  FROM s)
        |SELECT first_touch, COUNT(*) AS n_purchases,
        |       CAST(SUM(CAST(ROUND(value*1000000.0) AS BIGINT)) AS BIGINT) AS credited_micro
        |FROM f WHERE event_type = 'purchase'
        |GROUP BY first_touch ORDER BY first_touch""".stripMargin,

    "q114_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT c.cohort_day,
        |       CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT) AS day_offset,
        |       COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY c.cohort_day, day_offset
        |ORDER BY c.cohort_day, day_offset""".stripMargin,

    "q111_pit_join" ->
      """WITH c AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        |  FROM events WHERE event_id % 3 = 0),
        |ch AS (
        |  SELECT * FROM c WHERE prev_attr IS NULL OR prev_attr <> event_type),
        |h AS (
        |  SELECT user_id, event_type AS attr, ts AS effective_from,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
        |  FROM ch)
        |SELECT e.event_id, e.user_id, e.ts, h.attr
        |FROM events e LEFT JOIN h
        |  ON e.user_id = h.user_id
        | AND e.ts >= h.effective_from
        | AND (h.effective_to IS NULL OR e.ts < h.effective_to)
        |ORDER BY e.event_id""".stripMargin,

    "q88_rolling_window" ->
      """WITH d AS (
        |  SELECT event_type AS ticker, CAST(ts AS DATE) AS day,
        |         SUM(CAST(ROUND(value*1000000.0) AS BIGINT)) AS cm,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT ticker, day,
        |       CAST(CAST(SUM(cm) OVER w AS BIGINT) AS DOUBLE)/1000000.0 AS roll7_sum,
        |       CAST(SUM(n) OVER w AS BIGINT) AS roll7_n
        |FROM d
        |WINDOW w AS (PARTITION BY ticker
        |             ORDER BY date_diff('day', DATE '1970-01-01', day)
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY ticker, day""".stripMargin,

    "q84_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_stage1,
        |       (SELECT COUNT(*) FROM c) AS n_stage2,
        |       (SELECT COUNT(*) FROM p) AS n_stage3""".stripMargin,

    "q47_asof_native" ->
      """WITH l AS (
        |  SELECT event_id, event_type AS ticker, ts FROM events
        |  WHERE value >= 40 AND value < 80),
        |r AS (
        |  SELECT event_type AS ticker, ts AS rts, value AS close
        |  FROM events WHERE value >= 120 AND value < 150)
        |SELECT l.event_id, l.ticker, l.ts, r.close AS asof_close
        |FROM l ASOF LEFT JOIN r ON l.ticker = r.ticker AND l.ts >= r.rts
        |ORDER BY l.event_id""".stripMargin,

    "q38_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, event_type AS ticker, ts FROM events WHERE value < 40),
        |r AS (
        |  SELECT event_type AS ticker, ts AS rts, value AS close
        |  FROM events WHERE value >= 150)
        |SELECT l.event_id, l.ticker, l.ts, r.close AS asof_close
        |FROM l ASOF LEFT JOIN r ON l.ticker = r.ticker AND l.ts >= r.rts
        |ORDER BY l.event_id""".stripMargin,

    "q18_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |m AS (
        |  SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |                      > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |s AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // same sessions as q18, computed by Spark's native session_window
    "q56_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |m AS (
        |  SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |                      > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |s AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q19_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // identical values to q52's streaming join — the batch bucketed form
    "q61_range_join_bucketed" ->
      """WITH l AS (
        |  SELECT event_id, event_type AS ticker, ts FROM events WHERE value < 40),
        |r AS (
        |  SELECT event_type AS ticker, ts AS rts, value AS close, event_id AS rid
        |  FROM events WHERE value >= 150)
        |SELECT l.event_id, l.ticker, l.ts, r.rts, r.close, r.rid
        |FROM l JOIN r ON l.ticker = r.ticker
        |  AND r.rts >= l.ts - INTERVAL 2 HOUR AND r.rts <= l.ts
        |ORDER BY l.event_id, r.rid""".stripMargin,

    // identical values to q19 — the Spark side differs (variant encoding)
    "q58_variant_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
