package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's flagship order-sensitive fold: running weighted-average
  * cost basis + realized PnL per (user, ticker).
  *
  * Semantics (ref: /root/reference/app/services/portfolio.py:18-41 avg
  * cost, :74-110 realized PnL): walk the ledger in (ts, id) order per
  * key carrying (qty, avg_cost, realized);
  *   BUY  -> q1 = q0 + qty; avg1 = (q0*avg0 + (qty*price + fee)) / q1
  *           (0.0 when q1 <= 0)
  *   SELL -> skipped when flat (q0 <= 0); else sell = min(qty, q0);
  *           realized += (price - avg0) * sell; q0 -= sell; avg unchanged.
  *
  * This is non-associative (the divisor depends on the running qty and
  * SELL clamps at the held qty), so it cannot be a window or a partial
  * aggregate. The scalable shape is a shuffle on the group key followed
  * by a *streaming* per-partition walk over secondary-sorted rows:
  * `repartition(keys).sortWithinPartitions(keys, ts, id, ...)` then
  * `mapPartitions` — one shuffle, no per-key materialization, no
  * driver-side state, and group size is bounded only by what a single
  * executor can stream (not hold).
  */
object CostBasis {

  private val outSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ticker", LongType),
    StructField("qty", DoubleType),
    StructField("avg_cost", DoubleType),
    StructField("realized", DoubleType)))

  /** Fold a trades ledger with columns
    * (user_id: Long, ticker: Long, ts, id: Long, side, qty, price, fee)
    * into one row per (user_id, ticker): final qty, avg cost, realized PnL.
    * Ordering within key: (ts, id, side, qty, price, fee) — `id` is not
    * guaranteed unique in the fixtures, and rows fully tied on all fold
    * inputs commute, so the result is deterministic.
    *
    * `init` (used by [[foldCheckpointed]]) carries per-key starting state
    * (user_id, ticker, qty, avg_cost, realized); it is injected as a
    * synthetic side="INIT" row that sorts before every event of its key.
    */
  def fold(trades: DataFrame, init: Option[DataFrame] = None): DataFrame = {
    val events = trades
      .select(col("user_id").cast(LongType), col("ticker").cast(LongType),
        col("ts"), col("id").cast(LongType), col("side"),
        col("qty").cast(DoubleType), col("price").cast(DoubleType),
        coalesce(col("fee"), lit(0.0)).cast(DoubleType).as("fee"))
      .withColumn("_pri", lit(1))
    val tsType = events.schema("ts").dataType
    val withInit = init.fold(events) { st =>
      events.unionByName(st.select(
        col("user_id").cast(LongType), col("ticker").cast(LongType),
        lit(null).cast(tsType).as("ts"), lit(0L).as("id"),
        lit("INIT").as("side"), col("qty").cast(DoubleType),
        col("avg_cost").cast(DoubleType).as("price"),
        col("realized").cast(DoubleType).as("fee"),
        lit(0).as("_pri")))
    }
    val sorted = withInit
      .repartition(col("user_id"), col("ticker"))
      .sortWithinPartitions(col("user_id"), col("ticker"), col("_pri"),
        col("ts"), col("id"), col("side"), col("qty"), col("price"), col("fee"))

    sorted.mapPartitions { iter =>
      new Iterator[Row] {
        private var pending: Option[Row] = None
        private def nextGroupRow(): Option[Row] = {
          if (pending.isDefined) { val r = pending; pending = None; r }
          else if (iter.hasNext) Some(iter.next()) else None
        }
        private var lookahead: Option[Row] = nextGroupRow()
        override def hasNext: Boolean = lookahead.isDefined
        override def next(): Row = {
          val first = lookahead.get
          val user = first.getLong(0)
          val ticker = first.getLong(1)
          var q0 = 0.0; var avg0 = 0.0; var realized = 0.0
          var cur: Option[Row] = lookahead
          while (cur.isDefined && cur.get.getLong(0) == user && cur.get.getLong(1) == ticker) {
            val r = cur.get
            val side = r.getString(4)
            val qty = r.getDouble(5); val price = r.getDouble(6); val fee = r.getDouble(7)
            if (side == "INIT") {
              q0 = qty; avg0 = price; realized = fee
            } else if (side == "BUY") {
              val q1 = q0 + qty
              avg0 = if (q1 > 0) (q0 * avg0 + (qty * price + fee)) / q1 else 0.0
              q0 = q1
            } else if (q0 > 0) {
              val sell = math.min(qty, q0)
              realized += (price - avg0) * sell
              q0 -= sell
            }
            cur = if (iter.hasNext) Some(iter.next()) else None
          }
          lookahead = cur
          Row(user, ticker, q0, avg0, realized)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** SURVEY §7.4.1 segment checkpointing: the fold for keys too large to
    * stream through one executor pass comfortably — or ledgers that grow
    * forever. `segment` must be coarser than or aligned with `ts` order
    * (e.g. `date_trunc("month", ts)`): all rows of segment s_i sort
    * before all rows of s_{i+1} within every key. Segments are folded
    * sequentially as independent distributed jobs; between jobs only the
    * 3-double per-key state survives (checkpointed eagerly to break
    * lineage). Event-order per key is identical to [[fold]], so results
    * are bit-equal. The driver loop holds only the segment id list
    * (months/years — bounded), never data.
    */
  def foldCheckpointed(trades: DataFrame, segment: org.apache.spark.sql.Column): DataFrame = {
    val segs = trades.select(segment.as("_seg")).distinct()
      .orderBy("_seg").collect().map(_.get(0))
    var state: Option[DataFrame] = None
    for (s <- segs) {
      // localCheckpoint (eager) materializes the segment's fold AND
      // truncates lineage — persist() would not: each segment's plan
      // would nest every previous segment's chain, growing analysis
      // cost linearly and re-folding all history on cache eviction.
      // After the checkpoint the next segment starts from the 3-double
      // per-key state rows alone; superseded states are unreferenced on
      // reassignment and reclaimed by the context cleaner. (A deployment
      // that must survive executor loss uses checkpoint() to reliable
      // storage — same shape, same O(1) plan depth.)
      val next = fold(trades.filter(segment === lit(s)), state).localCheckpoint()
      state = Some(next)
    }
    state.getOrElse(fold(trades.limit(0)))
  }

  /** One trade event, ordered by (ts as epoch-day, id, side, qty, price,
    * fee) — the same total order the streaming fold uses. */
  case class TradeEv(ts: Int, id: Long, side: String, qty: Double,
                     price: Double, fee: Double)
  case class CostResult(qty: Double, avg_cost: Double, realized: Double)

  /** The same fold as a typed `Aggregator` (SURVEY §2.10): `reduce`
    * accumulates events, `merge` concatenates partial buffers, and
    * `finish` restores the total order and folds — legal under Spark's
    * partial aggregation because order is only imposed at the end.
    * The buffer holds the key's full event list, so this form is for
    * moderate group sizes where `.agg()` composition is worth that cost;
    * [[fold]] streams with O(1) state, and [[foldCheckpointed]] bounds
    * even a single giant key by folding time segments sequentially.
    */
  object FoldAggregator extends Aggregator[TradeEv, List[TradeEv], CostResult] {
    override def zero: List[TradeEv] = Nil
    override def reduce(b: List[TradeEv], e: TradeEv): List[TradeEv] = e :: b
    override def merge(a: List[TradeEv], b: List[TradeEv]): List[TradeEv] = a ::: b
    override def finish(buf: List[TradeEv]): CostResult = {
      implicit val ord: Ordering[TradeEv] =
        Ordering.by(e => (e.ts, e.id, e.side, e.qty, e.price, e.fee))
      var q0 = 0.0; var avg0 = 0.0; var realized = 0.0
      buf.sorted.foreach { e =>
        if (e.side == "BUY") {
          val q1 = q0 + e.qty
          avg0 = if (q1 > 0) (q0 * avg0 + (e.qty * e.price + e.fee)) / q1 else 0.0
          q0 = q1
        } else if (q0 > 0) {
          val sell = math.min(e.qty, q0)
          realized += (e.price - avg0) * sell
          q0 -= sell
        }
      }
      CostResult(q0, avg0, realized)
    }
    override def bufferEncoder: Encoder[List[TradeEv]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[CostResult] = Encoders.product[CostResult]
  }

  /** [[fold]] expressed through [[FoldAggregator]]; result-equivalent,
    * used where a Column aggregate composes better than mapPartitions. */
  def foldTyped(trades: DataFrame): DataFrame = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .select(col("user_id").cast(LongType), col("ticker").cast(LongType),
        datediff(col("ts"), lit("1970-01-01")).as("ts"), col("id").cast(LongType),
        col("side"), col("qty").cast(DoubleType), col("price").cast(DoubleType),
        coalesce(col("fee"), lit(0.0)).cast(DoubleType).as("fee"))
      .as[(Long, Long, Int, Long, String, Double, Double, Double)]
      .groupByKey { case (u, t, _, _, _, _, _, _) => (u, t) }
      .mapValues { case (_, _, ts, id, side, qty, price, fee) =>
        TradeEv(ts, id, side, qty, price, fee) }
      .agg(FoldAggregator.toColumn)
      .map { case ((u, t), r) => (u, t, r.qty, r.avg_cost, r.realized) }
      .toDF("user_id", "ticker", "qty", "avg_cost", "realized")
  }

  /** DuckDB mirror of [[fold]] as a recursive CTE over per-key event
    * ranks: iteration i applies each key's i-th event (keys whose
    * events are exhausted drop out of the working table; the final
    * state is each key's max-i row), with the state as three scalar
    * DOUBLE columns. The CASE arms apply bit-identical IEEE operations
    * in the same order as the Scala fold, so results hash-match
    * exactly. Recursion depth = max events per (user, ticker) key —
    * single digits at every fixture scale.
    *
    * Deliberately lambda-free: DuckDB 1.0's `list_reduce` with a
    * composite (list- or struct-typed) accumulator is arithmetically
    * unreliable at volume — the previous list-encoded fold returned
    * garbage state (qty ~1e135, denormal realized) for one key at
    * sf0.1 and segfaulted outright at sf1's 5.9M keys, and a
    * struct-encoded variant miscomputed a 5-event key even in
    * isolation. The recursive form is plain relational SQL (window +
    * join + CASE), validated bit-exact against an independent Python
    * replica of the fold at sf0.01 / sf0.1 / sf1 (all 5,909,730 sf1
    * keys; see tools/fold_oracle.py, retired to cross-validation).
    */
  val foldSql: String =
    """folded AS (
      |  WITH RECURSIVE ev AS MATERIALIZED (
      |    SELECT user_id, ticker, CAST(qty AS DOUBLE) AS qty,
      |           CAST(price AS DOUBLE) AS price, CAST(fee AS DOUBLE) AS fee, side,
      |           row_number() OVER (PARTITION BY user_id, ticker
      |                              ORDER BY ts, id, side, qty, price, fee) AS rn
      |    FROM trades),
      |  st AS (
      |    SELECT user_id, ticker, 0::BIGINT AS i,
      |           0.0::DOUBLE AS q, 0.0::DOUBLE AS c, 0.0::DOUBLE AS r
      |    FROM (SELECT DISTINCT user_id, ticker FROM ev)
      |    UNION ALL
      |    SELECT st.user_id, st.ticker, st.i + 1,
      |           CASE WHEN ev.side = 'BUY' THEN st.q + ev.qty
      |                WHEN st.q <= 0 THEN st.q
      |                ELSE st.q - least(ev.qty, st.q) END,
      |           CASE WHEN ev.side = 'BUY' THEN CASE WHEN st.q + ev.qty > 0
      |                  THEN (st.q*st.c + (ev.qty*ev.price + ev.fee)) / (st.q + ev.qty)
      |                  ELSE 0.0 END
      |                ELSE st.c END,
      |           CASE WHEN ev.side = 'BUY' OR st.q <= 0 THEN st.r
      |                ELSE st.r + (ev.price - st.c) * least(ev.qty, st.q) END
      |    FROM st JOIN ev ON ev.user_id = st.user_id AND ev.ticker = st.ticker
      |                   AND ev.rn = st.i + 1)
      |  SELECT user_id, ticker, q AS qty, c AS avg_cost, r AS realized
      |  FROM st
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ticker ORDER BY i DESC) = 1)""".stripMargin
}
