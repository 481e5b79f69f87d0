package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.PortfolioQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` maps each implemented SURVEY §2 operator to a DataFrame
  * program over `/root/testdata/sf*`; `oracleSql` holds the DuckDB twin
  * the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PortfolioQueries.overview(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_current_qty"      -> (PortfolioQueries.currentQty _),
    "q02_positions"        -> (PortfolioQueries.positions _),
    "q03_cash_balance"     -> (PortfolioQueries.cashBalance _),
    "q04_latest_prices"    -> (PortfolioQueries.latestPrices _),
    "q05_avg_cost"         -> (PortfolioQueries.avgCost _),
    "q06_realized_pnl"     -> (PortfolioQueries.realizedPnl _),
    "q07_overview"         -> (PortfolioQueries.overview _),
    "q15_unrealized_totals" -> (PortfolioQueries.unrealizedTotals _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = PortfolioQueries.oracle
}
