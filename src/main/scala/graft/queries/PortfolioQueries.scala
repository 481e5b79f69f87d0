package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.CostBasis

/** Portfolio-state queries (SURVEY §2.11 Q1-Q7, Q15) over the star-schema
  * trades view. Every query has a DuckDB oracle twin in [[oracle]].
  *
  * Float determinism: order-sensitive SUMs over "messy" doubles (products
  * of full-mantissa values) are computed on micro-scaled longs — the
  * per-row value is deterministic in both engines, the integer sum is
  * exact, and one final division restores the double. Integer-valued
  * doubles (qty) sum exactly as-is.
  */
object PortfolioQueries {

  val StartCash = 1000000.0 // ref: /root/reference/app/config.py:18

  /** Signed qty: +qty on BUY, -qty on SELL (ref: trades.py:28-38). */
  private def signedQty: Column =
    when(col("side") === "BUY", col("qty")).otherwise(-col("qty"))

  /** Exact decimal sum: per-row round(x*1e6) as long, summed exactly. */
  private def microSum(x: Column): Column = sum(round(x * 1e6).cast("long"))

  /** Q1: current qty per ticker for one user (ref: trades.py:28-38). */
  def currentQty(spark: SparkSession, sfDir: String): DataFrame =
    Tables.trades(spark, sfDir)
      .filter(col("user_id") === 1)
      .groupBy("ticker")
      .agg(coalesce(sum(signedQty), lit(0.0)).as("qty"))
      .orderBy("ticker")

  /** Q2: open positions per (user, ticker), HAVING qty <> 0
    * (ref: portfolio.py:5-16). */
  def positions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.trades(spark, sfDir)
      .groupBy("user_id", "ticker")
      .agg(sum(signedQty).as("qty"))
      .filter(col("qty") =!= 0)
      .orderBy("user_id", "ticker")

  /** Q3: cash balance per user: START_CASH + sells - buys - fees
    * (ref: portfolio.py:61-72). */
  def cashBalance(spark: SparkSession, sfDir: String): DataFrame =
    Tables.trades(spark, sfDir)
      .groupBy("user_id")
      .agg(
        microSum(when(col("side") === "SELL", col("qty") * col("price")).otherwise(0.0)).as("s"),
        microSum(when(col("side") === "BUY", col("qty") * col("price")).otherwise(0.0)).as("b"),
        microSum(col("fee")).as("f"))
      .select(col("user_id"),
        (lit(StartCash) + (col("s") - col("b") - col("f")).cast("double") / 1e6).as("cash"))
      .orderBy("user_id")

  /** Q4: latest close per ticker — argmax over the event stream
    * (ref: portfolio.py:43-59 CTE+join; here window row_number, which is
    * the shuffle-once Spark shape; ties broken by event_id). */
  def latestPrices(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("ticker").orderBy(col("ts").desc, col("event_id").desc)
    Tables.prices(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("ticker"), col("close").as("last_close"), col("ts").as("last_ts"))
      .orderBy("ticker")
  }

  /** Q5: running weighted-average cost per open position
    * (ref: portfolio.py:18-41) — the custom order-sensitive fold. */
  def avgCost(spark: SparkSession, sfDir: String): DataFrame =
    CostBasis.fold(Tables.trades(spark, sfDir))
      .filter(col("qty") > 0)
      .select(col("user_id"), col("ticker"), col("avg_cost").as("avg_buy_price"))
      .orderBy("user_id", "ticker")

  /** Q6: realized PnL per (user, ticker) (ref: portfolio.py:74-110). */
  def realizedPnl(spark: SparkSession, sfDir: String): DataFrame =
    CostBasis.fold(Tables.trades(spark, sfDir))
      .select(col("user_id"), col("ticker"), col("realized"))
      .orderBy("user_id", "ticker")

  /** Q7: overview — positions x avg-cost x price dim, derive market value
    * and unrealized PnL (ref: portfolio.py:112-127). The price side here
    * is the `part` dimension (broadcast-sized), mirroring the reference's
    * small-right-side joins. */
  def overview(spark: SparkSession, sfDir: String): DataFrame = {
    val pos = Tables.trades(spark, sfDir)
      .groupBy("user_id", "ticker")
      .agg(sum(signedQty).as("qty"))
      .filter(col("qty") =!= 0)
    val costs = CostBasis.fold(Tables.trades(spark, sfDir))
      .filter(col("qty") > 0)
      .select(col("user_id"), col("ticker"), col("avg_cost").as("avg_buy_price"))
    val last = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("ticker"), col("p_retailprice").as("last_close"))
    pos
      .join(costs, Seq("user_id", "ticker"), "left")
      .join(broadcast(last), Seq("ticker"), "left")
      .select(col("user_id"), col("ticker"), col("qty"), col("avg_buy_price"),
        col("last_close"),
        (col("qty") * col("last_close")).as("market_value"),
        ((col("last_close") - col("avg_buy_price")) * col("qty")).as("unreal_pnl"))
      .orderBy("user_id", "ticker")
  }

  /** Q15: per-user unrealized totals (ref: 1_Dashboard.py:206-227):
    * invested = qty*avg, pnl = mv - invested, pct guarded by invested>0. */
  def unrealizedTotals(spark: SparkSession, sfDir: String): DataFrame =
    overview(spark, sfDir)
      .filter(col("qty") > 0)
      .groupBy("user_id")
      .agg(
        microSum(col("qty") * col("avg_buy_price")).as("inv"),
        microSum(col("qty") * col("last_close")).as("mv"))
      .select(col("user_id"),
        (col("inv").cast("double") / 1e6).as("total_invested"),
        (col("mv").cast("double") / 1e6).as("total_mv"),
        ((col("mv") - col("inv")).cast("double") / 1e6).as("total_pnl"),
        when(col("inv") > 0,
          (col("mv") - col("inv")).cast("double") / (col("inv").cast("double")) * 100.0)
          .as("total_pct"))
      .orderBy("user_id")

  // ------------------------------------------------------------------
  // DuckDB oracle twins
  // ------------------------------------------------------------------

  private def withTrades(body: String): String =
    s"WITH ${Tables.tradesSql}\n$body"

  val oracle: Map[String, String] = Map(
    "q01_current_qty" -> withTrades(
      """SELECT ticker,
        |       COALESCE(SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END), 0) AS qty
        |FROM trades WHERE user_id = 1
        |GROUP BY ticker ORDER BY ticker""".stripMargin),

    "q02_positions" -> withTrades(
      """SELECT user_id, ticker,
        |       SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) AS qty
        |FROM trades GROUP BY user_id, ticker
        |HAVING SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) <> 0
        |ORDER BY user_id, ticker""".stripMargin),

    "q03_cash_balance" -> withTrades(
      """SELECT user_id,
        |       1000000.0 + CAST(
        |         SUM(CASE WHEN side='SELL' THEN CAST(ROUND(qty*price*1000000.0) AS BIGINT) ELSE 0 END)
        |       - SUM(CASE WHEN side='BUY'  THEN CAST(ROUND(qty*price*1000000.0) AS BIGINT) ELSE 0 END)
        |       - SUM(CAST(ROUND(fee*1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS cash
        |FROM trades GROUP BY user_id ORDER BY user_id""".stripMargin),

    "q04_latest_prices" ->
      s"""WITH ${Tables.pricesSql}
         |SELECT ticker, close AS last_close, ts AS last_ts FROM (
         |  SELECT ticker, close, ts,
         |         row_number() OVER (PARTITION BY ticker ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM prices) WHERE rn = 1 ORDER BY ticker""".stripMargin,

    "q05_avg_cost" -> withTrades(
      s""", ${CostBasis.foldSql}
         |SELECT user_id, ticker, avg_cost AS avg_buy_price
         |FROM folded WHERE qty > 0 ORDER BY user_id, ticker""".stripMargin),

    "q06_realized_pnl" -> withTrades(
      s""", ${CostBasis.foldSql}
         |SELECT user_id, ticker, realized
         |FROM folded ORDER BY user_id, ticker""".stripMargin),

    "q07_overview" -> withTrades(
      s""", ${CostBasis.foldSql},
         |pos AS (
         |  SELECT user_id, ticker, SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) AS qty
         |  FROM trades GROUP BY user_id, ticker
         |  HAVING SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) <> 0),
         |costs AS (SELECT user_id, ticker, avg_cost AS avg_buy_price FROM folded WHERE qty > 0),
         |last AS (SELECT p_partkey AS ticker, p_retailprice AS last_close FROM part)
         |SELECT pos.user_id, pos.ticker, pos.qty, costs.avg_buy_price, last.last_close,
         |       pos.qty * last.last_close AS market_value,
         |       (last.last_close - costs.avg_buy_price) * pos.qty AS unreal_pnl
         |FROM pos
         |LEFT JOIN costs ON pos.user_id = costs.user_id AND pos.ticker = costs.ticker
         |LEFT JOIN last ON pos.ticker = last.ticker
         |ORDER BY pos.user_id, pos.ticker""".stripMargin),

    "q15_unrealized_totals" -> withTrades(
      s""", ${CostBasis.foldSql},
         |pos AS (
         |  SELECT user_id, ticker, SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) AS qty
         |  FROM trades GROUP BY user_id, ticker
         |  HAVING SUM(CASE WHEN side='BUY' THEN qty ELSE -qty END) <> 0),
         |costs AS (SELECT user_id, ticker, avg_cost AS avg_buy_price FROM folded WHERE qty > 0),
         |last AS (SELECT p_partkey AS ticker, p_retailprice AS last_close FROM part),
         |ov AS (
         |  SELECT pos.user_id, pos.qty, costs.avg_buy_price, last.last_close
         |  FROM pos
         |  LEFT JOIN costs ON pos.user_id = costs.user_id AND pos.ticker = costs.ticker
         |  LEFT JOIN last ON pos.ticker = last.ticker
         |  WHERE pos.qty > 0),
         |t AS (
         |  SELECT user_id,
         |         SUM(CAST(ROUND(qty*avg_buy_price*1000000.0) AS BIGINT)) AS inv,
         |         SUM(CAST(ROUND(qty*last_close*1000000.0) AS BIGINT)) AS mv
         |  FROM ov GROUP BY user_id)
         |SELECT user_id,
         |       CAST(inv AS DOUBLE)/1000000.0 AS total_invested,
         |       CAST(mv AS DOUBLE)/1000000.0 AS total_mv,
         |       CAST(mv - inv AS DOUBLE)/1000000.0 AS total_pnl,
         |       CASE WHEN inv > 0
         |            THEN CAST(mv - inv AS DOUBLE)/CAST(inv AS DOUBLE)*100.0 END AS total_pct
         |FROM t ORDER BY user_id""".stripMargin)
  )
}
